package graft.queries

import org.apache.spark.sql.functions._

/** Remaining §2 slices: the null-safe join operator and the typed
  * Dataset lambda surface.
  */
object TypedQueries {

  /** Typed row for the Dataset-lambda slice (§2.10: the reference uses
    * Dataset.map/flatMap/filter in GeneOntology and the facet
    * modules).
    */
  final case class LiRow(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    QueryDef(
      "q_join_null_safe",
      (s, dir) => {
        // Null-safe multi-row join via <=> (reference
        // literature/PreProcessing.scala:21-27 joins on three <=> keys):
        // nation keys below 5 are nulled on both sides, and the
        // null-bucket rows must still pair up.
        val custSide = Tables(s, dir, "customer")
          .groupBy(
            when(col("c_nationkey") < 5, lit(null)).otherwise(col("c_nationkey")).as("nk")
          )
          .agg(count(lit(1)).as("n_cust"))
        val suppSide = Tables(s, dir, "supplier")
          .groupBy(
            when(col("s_nationkey") < 5, lit(null)).otherwise(col("s_nationkey")).as("nk2")
          )
          .agg(count(lit(1)).as("n_supp"))
        custSide
          .join(suppSide, col("nk") <=> col("nk2"))
          .select(col("nk").as("nationkey"), col("n_cust"), col("n_supp"))
          .orderBy(col("nationkey").asc_nulls_first)
      },
      Some("""SELECT nk AS nationkey, n_cust, n_supp
        FROM (SELECT CASE WHEN c_nationkey < 5 THEN NULL ELSE c_nationkey END AS nk,
                     COUNT(*) AS n_cust FROM customer GROUP BY 1) c
        JOIN (SELECT CASE WHEN s_nationkey < 5 THEN NULL ELSE s_nationkey END AS nk2,
                     COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
          ON nk IS NOT DISTINCT FROM nk2
        ORDER BY nationkey NULLS FIRST""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_typed_dataset_lambdas",
      (s, dir) => {
        // Typed Dataset filter/map (reference
        // target/GeneOntology.scala:151-163, searchFacet modules).
        // NOTE the deserialize/serialize fence around each lambda
        // breaks whole-stage codegen — fine for per-source adapters,
        // wrong for the hot path; the column-DSL twin of this query is
        // q_scalar_math_conditional.
        import s.implicits._
        Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
          // the typed boundary: LiRow's primitive fields are
          // non-nullable, so a hostile NULL row kills the deserializer
          // (NOT_NULL_ASSERT_VIOLATION — chaos-gate crash class). Rows
          // that cannot deserialize are dropped, mirrored in the
          // oracle's IS NOT NULL conjuncts.
          .na.drop(Seq("l_orderkey", "l_quantity", "l_returnflag"))
          .as[LiRow]
          .filter(r => r.l_quantity >= 49 && r.l_returnflag != "N")
          .map(r => (r.l_orderkey, r.l_returnflag, r.l_quantity * 2))
          .toDF("l_orderkey", "flag", "double_qty")
          .groupBy(col("flag"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("double_qty").cast("decimal(18,4)")).cast("decimal(38,2)").cast("double").as("sum_dq")
          )
          .orderBy("flag")
      },
      Some("""SELECT l_returnflag AS flag, COUNT(*) AS n,
          CAST(ROUND(SUM(CAST(l_quantity * 2 AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_dq
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_quantity IS NOT NULL
          AND l_returnflag IS NOT NULL
          AND l_quantity >= 49 AND l_returnflag != 'N'
        GROUP BY 1 ORDER BY 1""")
    )
  )
}
