package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator slice: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. Queries with `oracle = None` get a
  * weaker rows-only check from the driver.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None
)

object QueryDef {
  def registry(defs: Seq[QueryDef]): (
      Map[String, (SparkSession, String) => DataFrame],
      Map[String, String]
  ) = {
    val names = defs.map(_.name)
    require(names.distinct.size == names.size, s"duplicate query names: $names")
    (
      defs.map(d => d.name -> d.run).toMap,
      defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
    )
  }
}

object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.parquet stores ts as TIMESTAMP(NANOS): the session must
      // be built with spark.sql.legacy.parquet.nanosAsLong=true (see
      // Session.defaultConf / the entry-point mains) so the column
      // arrives as a raw nanos long; here it is truncated to
      // microseconds — the same ns->us truncation DuckDB applies when
      // it reads the file, so both engines see identical timestamps.
      // DERIVED events tables (a pipeline step's written output) carry
      // a proper microsecond TIMESTAMP already — only a raw-long ts
      // needs the truncation.
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn(
          "ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000"))
        )
      else raw
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}

/** DuckDB-side fragments matching ColumnKit's deterministic-aggregation
  * recipe exactly (exact DECIMAL arithmetic -> rescale to 2dp HALF_UP ->
  * one correctly-rounded conversion to double).
  */
object OracleSql {

  // NB: DuckDB's decimal->decimal CAST *truncates* on scale reduction;
  // its ROUND(decimal, n) rounds half-away-from-zero, which is exactly
  // Spark's HALF_UP decimal rescale. Hence ROUND here, CAST on the
  // Spark side.

  /** Matches ColumnKit.decSum. */
  def decSum(x: String): String =
    s"CAST(ROUND(SUM(CAST(($x) AS DECIMAL(18,4))), 2) AS DOUBLE)"

  /** Matches ColumnKit.decSumExpr over an exact decimal expression. */
  def decSumExpr(e: String): String =
    s"CAST(ROUND(SUM($e), 2) AS DOUBLE)"

  /** Matches ColumnKit.revenueTerm. */
  val revTerm: String =
    "(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))"

  /** Matches ColumnKit.decAvg (exact sum, then one double division). */
  def decAvg(x: String): String = s"(${decSum(x)} / COUNT(${x}))"

  /** DuckDB mirror of TextKit.charHash: left fold of codepoints,
    * (acc * mult + codepoint) mod HashP.
    */
  def foldSql(e: String, mult: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(list_filter(string_split($e, ''), c -> c != ''), " +
      s"c -> CAST(unicode(c) AS BIGINT))), (a, c) -> (a*$mult + c) % ${graft.functions.TextKit.HashP})"

  /** DuckDB replay of q_similarity_ann_lsh's multi-probe LSH search,
    * generated from the SAME seeded planes the Spark side uses. The
    * sign signature is portable because list_inner_product folds
    * left-to-right exactly like the native DotProduct expression
    * (verified bit-for-bit on the corpus), so an approximate search
    * still has an exact oracle.
    */
  /** DuckDB replay of q_text_grounding_stemmed. Porter stemming is not
    * ANSI-SQL-expressible as an algorithm, but its OUTPUT over the
    * corpus is: the documents generator draws text from a fixed
    * 29-token vocabulary (identical at every SF — asserted by
    * SourcesAndNlpSpec against the real testdata), so the oracle embeds
    * a (token -> stem) LUT generated from the SAME Scala stemmer at
    * query-build time — the annLshMultiprobeSql trick applied to text.
    * Out-of-vocabulary tokens fall back to identity via COALESCE, so a
    * stale vocabulary fails the gate loudly instead of passing.
    */
  lazy val stemmedGroundingVocab: Seq[String] = Seq(
    "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "value", "vector", "window"
  )

  lazy val stemmedGroundingSql: String = {
    val lut = stemmedGroundingVocab
      .map(w => s"('$w', '${graft.functions.Stemmer.stem(w)}')")
      .mkString(", ")
    s"""WITH lut0(tok, stm) AS (VALUES $lut),
       |ex AS (
       |  SELECT doc_id, lang,
       |    unnest(list_filter(string_split_regex(translate(lower(text), 'áéíóúαβγδεζηικλμνξπτυω', 'aeiouabgdezhiklmnxptuo'), '\\s+'),
       |      t -> t != '' AND NOT list_contains(['the','a','of','and','to','in','is'], t))) AS tok
       |  FROM documents),
       |st AS (SELECT doc_id, lang, COALESCE(l.stm, tok) AS stem
       |       FROM ex LEFT JOIN lut0 l USING (tok)),
       |lut AS (SELECT stem AS entity FROM st WHERE lang = 'en'
       |        GROUP BY 1 HAVING COUNT(*) >= 100),
       |m AS (SELECT doc_id, entity, COUNT(*) AS n_mentions
       |      FROM st JOIN lut ON stem = entity GROUP BY 1, 2),
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |        ORDER BY n_mentions DESC, entity) AS rnk FROM m)
       |SELECT doc_id, entity AS best_entity, n_mentions
       |FROM r WHERE rnk = 1 ORDER BY doc_id""".stripMargin
  }

  /** DuckDB replay of q_dedup_semantic: the corpus-scaled cluster
    * signature is generated from the SAME seeded planes and the SAME
    * integer plane-count ladder the Spark side uses (the
    * annLshMultiprobeSql portability argument — list_inner_product
    * folds left-to-right like the native DotProduct, so both engines
    * compute identical clusters and identical pairwise cosines; the
    * ladder is integer comparisons, so np cannot diverge either).
    */
  lazy val semanticDedupSql: String = {
    import graft.functions.VectorKit
    val planes = VectorKit.randomSignPlanes(VectorKit.SemDedupMaxPlanes, dim = VectorKit.EmbeddingDim)
    val cluster = planes.zipWithIndex.map { case (p, j) =>
      val lit = p.map(v => if (v > 0) "1" else "-1").mkString("[", ",", "]")
      s"(CASE WHEN $j < np AND list_inner_product(e, CAST($lit AS DOUBLE[])) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    val npSql = VectorKit.planeCountSql("COUNT(*)", VectorKit.SemDedupTarget,
      VectorKit.SemDedupMinPlanes, VectorKit.SemDedupMaxPlanes)
    // Degenerate vectors (zero norm, NaN/Inf, NULL, null element) keep
    // their cluster (NaN projections land in the all-bits bucket in
    // both engines, NULL/null-element/zero vectors in bucket 0) but
    // are excluded from BOTH sides of the pairwise dup join and
    // carried kept=true — mirrors the Spark side's `good` filter
    // exactly. The cluster signature is a PROJECTION, where DuckDB's
    // list_inner_product throws on NULL lists AND on lists with null
    // elements with no way to guard (see VectorKit.normalizableSql),
    // so `b` is a MATERIALIZED CTE that first maps both to an explicit
    // zero vector — same policy class, same cluster 0 (matching
    // VectorKit.toDouble's null-element -> NULL normalization on the
    // Spark side), flat vector for the projection. The normalizable
    // checks then sit in the dup join's WHERE (filter conjuncts
    // short-circuit).
    val okA = VectorKit.normalizableSql("a.e")
    val okX = VectorKit.normalizableSql("x.e")
    s"""WITH np0 AS (SELECT $npSql AS np FROM embeddings),
       |b AS MATERIALIZED (SELECT vec_id,
       |      COALESCE(${VectorKit.sanitizedSql("CAST(embedding AS DOUBLE[])")},
       |               ${VectorKit.zerosSql(VectorKit.EmbeddingDim)}) AS e
       |      FROM embeddings),
       |bb AS (SELECT vec_id, e, $cluster AS cluster FROM b, np0),
       |d AS (SELECT DISTINCT x.vec_id AS dup_id
       |      FROM bb a JOIN bb x ON a.cluster = x.cluster AND a.vec_id < x.vec_id
       |      WHERE $okA AND $okX
       |        AND list_cosine_similarity(a.e, x.e) >= 0.35)
       |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, dup_id IS NULL AS kept
       |FROM bb LEFT JOIN d ON vec_id = dup_id ORDER BY vec_id""".stripMargin
  }

  lazy val annLshMultiprobeSql: String = {
    val planes = graft.functions.VectorKit.randomSignPlanes(
      numPlanes = 6, dim = graft.functions.VectorKit.EmbeddingDim)
    val bucket = planes.zipWithIndex.map { case (p, j) =>
      val lit = p.map(v => if (v > 0) "1" else "-1").mkString("[", ",", "]")
      s"(CASE WHEN list_inner_product(e, CAST($lit AS DOUBLE[])) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    val probeCond = ("b.bucket = qb" +: planes.indices.map(j => s"b.bucket = xor(qb, ${1L << j})"))
      .mkString(" OR ")
    val sanitized = graft.functions.VectorKit
      .sanitizedSql("CAST(embedding AS DOUBLE[])")
    val normalizable = graft.functions.VectorKit.normalizableSql("e")
    s"""WITH b0 AS MATERIALIZED (SELECT vec_id, $sanitized AS e FROM embeddings),
       |b AS (SELECT vec_id, e FROM b0 WHERE $normalizable),
       |bb AS (SELECT vec_id, e, $bucket AS bucket FROM b),
       |q AS (SELECT vec_id AS qid, e AS qe, bucket AS qb FROM bb WHERE vec_id < 10),
       |cand AS (SELECT qid, b.vec_id AS nid, list_cosine_similarity(qe, b.e) AS cos
       |         FROM q JOIN bb b ON b.vec_id != qid AND ($probeCond)),
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
       |      FROM cand)
       |SELECT qid, CAST(rk AS INTEGER) AS rk, nid, ROUND(cos, 6) AS cosine
       |FROM r WHERE rk <= 3 ORDER BY qid, rk""".stripMargin
  }
}
