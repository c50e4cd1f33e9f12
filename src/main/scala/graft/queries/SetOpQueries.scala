package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.ColumnKit

/** Set-operation slices (SURVEY.md §2.7): positional union,
  * unionByName across mismatched schemas (the reference's
  * pad-with-nulls idiom, Helpers.scala:209-239), except, intersect.
  *
  * All four are narrow or single-shuffle ops: unions are free
  * (partition concatenation); except/intersect shuffle both sides on
  * the full row — at 100 TB prefer a left_anti/left_semi join on an
  * explicit key, which these queries demonstrate is semantically
  * equivalent via their oracles.
  */
object SetOpQueries {

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    QueryDef(
      "q_setop_union_all",
      (s, dir) => {
        // Positional union (reference backend/Interaction.scala:102,
        // target/Ortholog.scala:59-88).
        val rich = Tables(s, dir, "customer")
          .filter(col("c_acctbal") > 9000)
          .select(col("c_custkey").as("id"), lit("customer").as("kind"))
        val supp = Tables(s, dir, "supplier")
          .filter(col("s_acctbal") > 9000)
          .select(col("s_suppkey").as("id"), lit("supplier").as("kind"))
        rich.union(supp).orderBy("kind", "id")
      },
      Some("""SELECT c_custkey AS id, 'customer' AS kind FROM customer WHERE c_acctbal > 9000
        UNION ALL
        SELECT s_suppkey, 'supplier' FROM supplier WHERE s_acctbal > 9000
        ORDER BY kind, id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_setop_union_diff_schema",
      (s, dir) => {
        // unionByName across different schemas: missing columns padded
        // with typed nulls (reference Helpers.scala:209-239; used at
        // Expression.scala:78, Interaction.scala:347-350, and via
        // unionByName(allowMissingColumns) at Grounding.scala:266,619).
        val cust = Tables(s, dir, "customer")
          .select(col("c_custkey").as("id"), col("c_name").as("name"), col("c_acctbal").as("acctbal"))
        val supp = Tables(s, dir, "supplier")
          .select(col("s_suppkey").as("id"), col("s_name").as("name"))
        ColumnKit.unionDifferentSchema(cust, supp)
          .orderBy(col("name"))
      },
      Some("""SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal FROM customer
        UNION ALL
        SELECT s_suppkey, s_name, NULL FROM supplier
        ORDER BY name""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_setop_except",
      (s, dir) =>
        // EXCEPT DISTINCT (reference Expression.scala:133): parts never
        // shipped. At scale the same result is a left_anti join on the
        // key — see q_join_left_anti.
        Tables(s, dir, "part")
          .select(col("p_partkey"))
          .except(Tables(s, dir, "lineitem").select(col("l_partkey").as("p_partkey")))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey FROM part
        EXCEPT
        SELECT l_partkey FROM lineitem
        ORDER BY p_partkey""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_setop_intersect",
      (s, dir) =>
        // INTERSECT DISTINCT (available though unused in the reference,
        // SURVEY.md §2.7): parts both heavily ordered and discounted.
        Tables(s, dir, "lineitem")
          .filter(col("l_quantity") >= 45)
          .select(col("l_partkey"))
          .intersect(
            Tables(s, dir, "lineitem")
              .filter(col("l_discount") >= 0.08)
              .select(col("l_partkey"))
          )
          .orderBy("l_partkey"),
      Some("""SELECT l_partkey FROM lineitem WHERE l_quantity >= 45
        INTERSECT
        SELECT l_partkey FROM lineitem WHERE l_discount >= 0.08
        ORDER BY l_partkey""")
    )
  )
}
