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

  def fromJsonString(json: String): AppConfig = {
    val j = JsonMethods.parse(json)
    AppConfig(
      appName = (j \ "appName").extractOrElse[String]("graft"),
      master = (j \ "master").extractOpt[String],
      sparkConf = (j \ "sparkConf").extractOrElse[Map[String, String]](Map.empty),
      steps = (j \ "steps") match {
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
      }
    )
  }

  def fromJsonFile(path: String): AppConfig =
    fromJsonString(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
