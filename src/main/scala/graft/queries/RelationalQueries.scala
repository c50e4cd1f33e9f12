package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType}

import graft.functions.ColumnKit.{revenueTerm, round6}
import graft.functions.{ColumnKit => K}
import OracleSql.{decAvg, decSum, decSumExpr, revTerm}

/** Core relational operator slices: scans, filters, every join flavor
  * the reference uses (SURVEY.md §2.2-§2.3), aggregation shapes
  * (§2.4), and the flagship top-k-per-group scoring pipeline that
  * mirrors the Search-step skeleton (reference backend/Search.scala:98-293).
  *
  * Scale notes (100 TB posture):
  *  - dimension tables (region/nation/supplier) are broadcast — no shuffle;
  *  - fact-fact joins shuffle on their join keys and rely on AQE for
  *    skew splitting;
  *  - every aggregate is partial-aggregated map-side (plain groupBy.agg);
  *  - top-k per group is a single shuffle on the group key (window rank),
  *    never a global sort.
  */
object RelationalQueries {

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    QueryDef(
      "q_agg_pricing_summary",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("1998-09-01"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            decSumCol(col("l_quantity")).as("sum_qty"),
            decSumCol(col("l_extendedprice")).as("sum_base_price"),
            decSumExprCol(revenueTerm(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
            decAvgCol(col("l_quantity")).as("avg_qty"),
            decAvgCol(col("l_extendedprice")).as("avg_price"),
            count(lit(1)).as("count_order")
          )
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${decSum("l_quantity")} AS sum_qty,
        ${decSum("l_extendedprice")} AS sum_base_price,
        ${decSumExpr(revTerm)} AS sum_disc_price,
        ${decAvg("l_quantity")} AS avg_qty,
        ${decAvg("l_extendedprice")} AS avg_price,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY 1, 2 ORDER BY 1, 2""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_scan_filter_project",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .filter(
            col("l_shipdate").between(lit("1996-01-01"), lit("1996-12-31")) &&
              col("l_quantity") < 10 && col("l_returnflag") === "R"
          )
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            col("l_extendedprice"),
            col("l_shipdate").cast(DateType).as("ship_date")
          )
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice,
        CAST(l_shipdate AS DATE) AS ship_date
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
          AND l_quantity < 10 AND l_returnflag = 'R'
        ORDER BY 1, 2""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_join_inner_shipping",
      (s, dir) => {
        val cut = "1998-06-01"
        val cust = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ords = Tables(s, dir, "orders").filter(col("o_orderdate") < lit(cut))
        val li = Tables(s, dir, "lineitem").filter(col("l_shipdate") > lit(cut))
        li.join(ords, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate").cast(DateType).as("order_date"))
          .agg(decSumExprCol(revenueTerm(col("l_extendedprice"), col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
      },
      Some(s"""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        ${decSumExpr(revTerm)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01' AND l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY 1, 2 ORDER BY revenue DESC, o_orderkey""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_join_left_outer",
      (s, dir) => {
        val perCust = Tables(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("cnt"), decSumCol(col("o_totalprice")).as("spent"))
        Tables(s, dir, "customer")
          .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
          .select(
            col("c_custkey"),
            col("c_name"),
            coalesce(col("cnt"), lit(0L)).as("n_orders"),
            coalesce(col("spent"), lit(0.0)).as("total_spent")
          )
          .orderBy("c_custkey")
      },
      Some(s"""SELECT c_custkey, c_name,
        COALESCE(cnt, 0) AS n_orders, COALESCE(spent, 0.0) AS total_spent
        FROM customer LEFT JOIN (
          SELECT o_custkey, COUNT(*) AS cnt, ${decSum("o_totalprice")} AS spent
          FROM orders GROUP BY 1) ord ON c_custkey = o_custkey
        ORDER BY c_custkey""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_join_right_outer",
      (s, dir) => {
        val shipped = Tables(s, dir, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("cnt"))
        shipped
          .join(Tables(s, dir, "part"), col("l_partkey") === col("p_partkey"), "right")
          .select(
            col("p_partkey"),
            col("p_name"),
            coalesce(col("cnt"), lit(0L)).as("n_shipments")
          )
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_name, COALESCE(cnt, 0) AS n_shipments
        FROM (SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1) li
        RIGHT JOIN part ON l_partkey = p_partkey
        ORDER BY p_partkey""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_join_full_outer",
      (s, dir) => {
        val rich = Tables(s, dir, "customer")
          .filter(col("c_acctbal") > 9500)
          .groupBy(col("c_nationkey").as("nk_c"))
          .agg(count(lit(1)).as("n_rich_cust"))
        val sup = Tables(s, dir, "supplier")
          .filter(col("s_acctbal") > 9500)
          .groupBy(col("s_nationkey").as("nk_s"))
          .agg(count(lit(1)).as("n_rich_supp"))
        rich
          .join(sup, col("nk_c") === col("nk_s"), "full_outer")
          .select(
            coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
            coalesce(col("n_rich_cust"), lit(0L)).as("n_rich_cust"),
            coalesce(col("n_rich_supp"), lit(0L)).as("n_rich_supp")
          )
          .orderBy("nationkey")
      },
      Some("""SELECT COALESCE(nk_c, nk_s) AS nationkey,
        COALESCE(n_rich_cust, 0) AS n_rich_cust,
        COALESCE(n_rich_supp, 0) AS n_rich_supp
        FROM (SELECT c_nationkey AS nk_c, COUNT(*) AS n_rich_cust
              FROM customer WHERE c_acctbal > 9500 GROUP BY 1) c
        FULL OUTER JOIN
             (SELECT s_nationkey AS nk_s, COUNT(*) AS n_rich_supp
              FROM supplier WHERE s_acctbal > 9500 GROUP BY 1) s
        ON nk_c = nk_s
        ORDER BY nationkey""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_join_left_anti",
      (s, dir) =>
        // Blacklist-style filtering (reference
        // openfda/stage/EventsFiltering.scala:10-15): customers with no
        // order in the last data year.
        Tables(s, dir, "customer")
          .join(
            Tables(s, dir, "orders").filter(col("o_orderdate") >= lit("2001-01-01")),
            col("c_custkey") === col("o_custkey"),
            "left_anti"
          )
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2001-01-01')
        ORDER BY c_custkey""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_join_left_semi",
      (s, dir) =>
        Tables(s, dir, "part")
          .join(
            Tables(s, dir, "lineitem").filter(col("l_quantity") >= 49),
            col("p_partkey") === col("l_partkey"),
            "left_semi"
          )
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_parts"))
          .orderBy("p_brand"),
      Some("""SELECT p_brand, COUNT(*) AS n_parts FROM part
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_partkey = p_partkey AND l_quantity >= 49)
        GROUP BY 1 ORDER BY 1""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_join_broadcast_dims",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val sup = Tables(s, dir, "supplier")
        val nat = Tables(s, dir, "nation")
        val reg = Tables(s, dir, "region")
        // Dimension chain is broadcast end-to-end: the only shuffle in
        // this plan is the final group-by on (r_name, n_name).
        li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            decSumExprCol(revenueTerm(col("l_extendedprice"), col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_lines")
          )
          .orderBy("r_name", "n_name")
      },
      Some(s"""SELECT r_name, n_name, ${decSumExpr(revTerm)} AS revenue, COUNT(*) AS n_lines
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2 ORDER BY 1, 2""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_join_theta",
      (s, dir) => {
        // Equi-key plus non-equi residual + compound boolean condition
        // (reference: literature/Grounding.scala:608-611,
        // backend/Interaction.scala:228-237). Catalyst keeps this a hash
        // join on the equi key with the residual as a post-join filter.
        val li = Tables(s, dir, "lineitem")
        val o = Tables(s, dir, "orders")
        li.join(
            o,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS") &&
              (col("l_returnflag") === "R" || col("o_orderstatus") === "F")
          )
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_late"),
            decSumExprCol(revenueTerm(col("l_extendedprice"), col("l_discount"))).as("late_revenue")
          )
          .orderBy("o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n_late,
        ${decSumExpr(revTerm)} AS late_revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND (l_returnflag = 'R' OR o_orderstatus = 'F')
        GROUP BY 1 ORDER BY 1""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_topk_revenue_region",
      (s, dir) => topPartsPerRegion(s, dir),
      Some(s"""WITH rev AS (
          SELECT r_name, l_partkey, ${decSumExpr(revTerm)} AS revenue,
                 COUNT(*) AS n_lines, ${decAvg("l_quantity")} AS avg_qty
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY 1, 2),
        ranked AS (
          SELECT *, RANK() OVER (PARTITION BY r_name ORDER BY revenue DESC, l_partkey) AS rnk
          FROM rev)
        SELECT r_name, CAST(rnk AS BIGINT) AS rnk, p_name, revenue, n_lines, avg_qty,
               ROUND(LN(1 + revenue) + 1, 6) AS relevance
        FROM ranked JOIN part ON l_partkey = p_partkey
        WHERE rnk <= 5 ORDER BY r_name, rnk""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_window_dense_rank_argmax",
      (s, dir) => {
        // dense_rank()=1 argmax-per-group (reference
        // literature/Grounding.scala:187-194), made deterministic with a
        // unique tie-break key.
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables(s, dir, "orders")
          .withColumn("rnk", dense_rank().over(w))
          .filter(col("rnk") === 1)
          .select(
            col("o_custkey"),
            col("o_orderkey").as("best_order"),
            col("o_totalprice").as("best_price"),
            col("o_orderdate").cast(DateType).as("best_date")
          )
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, best_order, best_price, best_date FROM (
          SELECT o_custkey, o_orderkey AS best_order, o_totalprice AS best_price,
                 CAST(o_orderdate AS DATE) AS best_date,
                 DENSE_RANK() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders) t WHERE rnk = 1 ORDER BY o_custkey""")
    )
  )

  /** Flagship pipeline: top-5 parts per region by revenue with a
    * log-relevance multiplier — the Search-step skeleton
    * (reference Search.scala:98-293: LUT joins, rank<=K windows,
    * log1p(mean)+1 multiplier) over the star schema.
    */
  def topPartsPerRegion(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val sup = Tables(s, dir, "supplier")
    val nat = Tables(s, dir, "nation")
    val reg = Tables(s, dir, "region")
    val part = Tables(s, dir, "part")

    val rev = li
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("l_partkey"))
      .agg(
        decSumExprCol(revenueTerm(col("l_extendedprice"), col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"),
        decAvgCol(col("l_quantity")).as("avg_qty")
      )

    val w = Window.partitionBy(col("r_name")).orderBy(col("revenue").desc, col("l_partkey").asc)
    rev
      .withColumn("rnk", rank().over(w).cast(LongType))
      .filter(col("rnk") <= 5)
      // `part` is a fact-sized table at 100 TB — shuffle join, not broadcast.
      // The rank<=5 filter has already shrunk the left side to 5*|regions|.
      .join(part, col("l_partkey") === col("p_partkey"))
      .select(
        col("r_name"), col("rnk"), col("p_name"), col("revenue"), col("n_lines"),
        col("avg_qty"),
        round6(log1p(col("revenue")) + 1).as("relevance")
      )
      .orderBy("r_name", "rnk")
  }

  // Scala-side aliases so query bodies read like the oracle fragments.
  private def decSumCol(c: org.apache.spark.sql.Column) = K.decSum(c)
  private def decSumExprCol(c: org.apache.spark.sql.Column) = K.decSumExpr(c)
  private def decAvgCol(c: org.apache.spark.sql.Column) = K.decAvg(c)
}
