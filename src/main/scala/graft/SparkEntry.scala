package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is one entry in
  * `queries`; entries whose semantics are ANSI-SQL-expressible also
  * carry a DuckDB oracle in `oracleSql`. Both maps are assembled from
  * the per-domain query registries under `graft.queries`.
  */
object SparkEntry {

  private val allDefs: Seq[QueryDef] =
    RelationalQueries.defs ++ WindowQueries.defs ++ SetOpQueries.defs ++
      ScalarQueries.defs ++ AnalyticsQueries.defs ++ TextQueries.defs ++
      SimilarityQueries.defs ++ MultimodalQueries.defs ++ CompositeQueries.defs ++
      TypedQueries.defs ++ ExtendedRelationalQueries.defs ++ SourceModelQueries.defs ++
      ArchiveQueries.defs ++ StorageQueries.defs

  private val (queryMap, oracleMap) = QueryDef.registry(allDefs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.topPartsPerRegion(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = queryMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = oracleMap
}
