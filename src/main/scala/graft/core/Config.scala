package graft.core

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Application configuration (reference: pureconfig-loaded HOCON
  * `OTConfig` tree, etl/backend/Configuration.scala:205-210 +
  * ETLSessionContext.scala:17-29). pureconfig/typesafe-config are not
  * on this classpath, so the shell loads an equivalent JSON tree with
  * json4s (bundled with Spark). The architecture parity is the point:
  * config -> session conf -> ordered step list -> per-step input/
  * output resources.
  */
final case class StepSpec(
    name: String,
    query: String,
    sfDir: String,
    output: IoConfig
)

final case class AppConfig(
    appName: String,
    master: Option[String],
    sparkConf: Map[String, String],
    steps: Seq[StepSpec]
)

object Config {

  private implicit val formats: Formats = DefaultFormats

  /** Inter-step wiring (the reference's HOCON substitution contract,
    * reference.conf:118 `interaction.input.targets =
    * ${steps.target.output.target}`): a step's `sfDir` or output path
    * may reference an EARLIER step's output as
    * `${steps.<name>.output.path}` (the path itself) or
    * `${steps.<name>.output.dir}` (its parent directory — the table
    * root when the producing step writes `<dir>/<table>.parquet`).
    * Forward or unknown references fail fast at parse time, like the
    * reference's config loader.
    */
  private val stepRef = """\$\{steps\.([A-Za-z0-9_-]+)\.output\.(path|dir)\}""".r

  private def resolveStepRefs(steps: Seq[StepSpec]): Seq[StepSpec] =
    steps
      .foldLeft(Vector.empty[StepSpec]) { (done, s) =>
        def sub(v: String): String = stepRef.replaceAllIn(
          v,
          m => {
            val producer = done.find(_.name == m.group(1)).getOrElse {
              throw new IllegalArgumentException(
                s"step '${s.name}' references '${m.group(1)}', which is not an earlier step")
            }
            val p = producer.output.path
            val resolved =
              if (m.group(2) == "dir") p.substring(0, p.lastIndexOf('/')) else p
            java.util.regex.Matcher.quoteReplacement(resolved)
          }
        )
        done :+ s.copy(sfDir = sub(s.sfDir), output = s.output.copy(path = sub(s.output.path)))
      }

  def fromJsonString(json: String): AppConfig = {
    val j = JsonMethods.parse(json)
    AppConfig(
      appName = (j \ "appName").extractOrElse[String]("graft"),
      master = (j \ "master").extractOpt[String],
      sparkConf = (j \ "sparkConf").extractOrElse[Map[String, String]](Map.empty),
      steps = resolveStepRefs((j \ "steps") match {
        case JArray(items) =>
          items.map { s =>
            StepSpec(
              name = (s \ "name").extract[String],
              query = (s \ "query").extract[String],
              sfDir = (s \ "sfDir").extract[String],
              output = IoConfig(
                format = (s \ "output" \ "format").extractOrElse[String]("parquet"),
                path = (s \ "output" \ "path").extract[String],
                options = (s \ "output" \ "options").extractOrElse[Map[String, String]](Map.empty),
                partitionBy = (s \ "output" \ "partitionBy").extractOrElse[Seq[String]](Nil),
                mode = (s \ "output" \ "mode").extractOrElse[String]("overwrite")
              )
            )
          }
        case _ => Nil
      })
    )
  }

  def fromJsonFile(path: String): AppConfig =
    fromJsonString(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
