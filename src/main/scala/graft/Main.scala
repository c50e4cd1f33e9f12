package graft

import org.apache.spark.sql.SparkSession

import graft.core.{AppConfig, Config, Io, Session, StepSpec}

/** Application shell: config-driven step dispatcher (reference
  * lifecycle, SURVEY.md §3.1: Main -> ETLSessionContext -> ordered
  * steps -> readFrom/transform/writeTo, unknown step throws).
  *
  * Each step names a registered query (the engine's operator
  * registry), the scale-factor directory it reads, and an output
  * resource; `writeTo` is the only action. Usage:
  *
  *   runMain graft.Main /path/to/config.json
  */
object Main {

  def runStep(spark: SparkSession, step: StepSpec): Unit = {
    val queries = SparkEntry.queries
    require(
      queries.contains(step.query),
      s"unknown step query '${step.query}' (step '${step.name}'); " +
        s"registered: ${queries.keys.toSeq.sorted.take(10).mkString(", ")}, ..."
    )
    val df = queries(step.query)(spark, step.sfDir)
    Io.write(df, step.output)
  }

  def run(config: AppConfig): Unit = {
    val spark = Session.build(
      appName = config.appName,
      master = config.master,
      extraConf = config.sparkConf
    )
    try config.steps.foreach(runStep(spark, _))
    finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: graft.Main <config.json>")
    run(Config.fromJsonFile(args(0)))
  }
}
