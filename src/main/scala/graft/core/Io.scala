package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named input/output: a format + path + reader/writer options.
  *
  * Re-expression of the reference's `IOResourceConfig`
  * (etl/backend/spark/IoHelpers.scala:28-33): every scan and sink in the
  * engine is declared as data, so pipelines stay pure
  * `Map[String, DataFrame] => Map[String, DataFrame]` functions.
  *
  * @param partitionBy hive-style partition columns on write — this is what
  *   enables read-side partition pruning at the 100 TB scale.
  * @param schemaDdl optional DECLARED read schema as a DDL string
  *   ("id BIGINT, name STRING") — the third leg of the reference's
  *   mixed schema system (SURVEY §1.3: inferred / positional /
  *   declared). A declared schema is what makes the malformed-record
  *   policies real: PERMISSIVE/DROPMALFORMED/FAILFAST judge each
  *   CSV/JSON record against it at PARSE time, and a
  *   `columnNameOfCorruptRecord` column named here receives the raw
  *   text of quarantined records (SourceChaosSpec pins the per-class
  *   behavior). Inference, by contrast, can only widen types to fit
  *   the dirt — never flag it.
  */
final case class IoConfig(
    format: String,
    path: String,
    options: Map[String, String] = Map.empty,
    partitionBy: Seq[String] = Nil,
    mode: String = "errorifexists",
    schemaDdl: Option[String] = None
)

object Io {

  /** Spark's own writer modes; validated eagerly like the reference's
    * `SparkSettings.validateWriteMode` (etl/backend/Configuration.scala:188-197).
    */
  val validWriteModes: Set[String] =
    Set("error", "errorifexists", "append", "overwrite", "ignore")

  /** Generic config-driven scan (reference IoHelpers.scala:57-72).
    * Handles csv/json/parquet/orc/text, .gz transparently, and glob paths.
    */
  def read(spark: SparkSession, cfg: IoConfig): DataFrame = {
    val reader = spark.read.format(cfg.format).options(cfg.options)
    cfg.schemaDdl.fold(reader)(reader.schema).load(cfg.path)
  }

  /** Multi-resource scan (reference IoHelpers.scala:48-55). */
  def readAll(spark: SparkSession, cfgs: Map[String, IoConfig]): Map[String, DataFrame] =
    cfgs.map { case (name, cfg) => name -> read(spark, cfg) }

  /** Generic config-driven sink (reference IoHelpers.scala:98-123). */
  def write(df: DataFrame, cfg: IoConfig): Unit = {
    require(
      validWriteModes.contains(cfg.mode.toLowerCase),
      s"invalid write mode '${cfg.mode}', valid: ${validWriteModes.mkString(",")}"
    )
    val w = df.write.format(cfg.format).options(cfg.options).mode(cfg.mode)
    val pw = if (cfg.partitionBy.nonEmpty) w.partitionBy(cfg.partitionBy: _*) else w
    pw.save(cfg.path)
  }

  /** Fan-out sink: compute once, write to N formats/paths
    * (reference `addAdditionalOutputFormats`, IoHelpers.scala:141-166).
    * The cache guarantees the plan executes once rather than once per sink.
    */
  def writeFanOut(df: DataFrame, sinks: Seq[IoConfig]): Unit = {
    if (sinks.sizeIs > 1) {
      df.cache()
      try sinks.foreach(write(df, _))
      finally df.unpersist()
    } else sinks.foreach(write(df, _))
  }

  /** Write a map of named outputs (reference IoHelpers.scala:178-196). */
  def writeAll(outputs: Map[String, (DataFrame, IoConfig)]): Unit =
    outputs.foreach { case (_, (df, cfg)) => write(df, cfg) }
}
