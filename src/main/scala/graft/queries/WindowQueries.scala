package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Window-function operator slices (SURVEY.md §2.5) plus the
  * latest-wins dedup and HLL shapes that ride on windows in the
  * reference.
  *
  * Scale notes: every partitioned window is one shuffle on its
  * partition key. The two *global* windows below (ntile) mirror the
  * reference's decile binning (target/GeneticConstraints.scala:47-50)
  * — a single-partition sort that is fine for dimension-sized inputs
  * but must become approx-percentile binning for fact-sized data; the
  * comment marks the cutover.
  */
object WindowQueries {

  private val D18_4 = DecimalType(18, 4)
  private val D38_2 = DecimalType(38, 2)

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    QueryDef(
      "q_window_ntile",
      (s, dir) => {
        // Global ntile binning (reference target/GeneticConstraints.scala:47-50).
        // NOTE single-partition sort: correct for dimension-sized input
        // (customer); at fact scale switch to approx_percentile cutpoints
        // + a broadcast range lookup.
        val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        Tables(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal"))
          .withColumn("tile", ntile(6).over(w))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal,
        CAST(NTILE(6) OVER (ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS tile
        FROM customer ORDER BY c_custkey""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_window_ntile_approx",
      (s, dir) => {
        // The fact-scale cutover for global ntile binning (the
        // single-partition-sort trap flagged on q_window_ntile):
        // approx_percentile computes the 5 sextile cutpoints as a
        // partial-aggregable sketch (one shuffle-free reduce, no global
        // sort), then a broadcast of the 1-row cutpoint array assigns
        // each row its bin with a codegen'd range lookup — the plan
        // scales to any row count because nothing is ever globally
        // sorted. The sketch makes bin sizes approximate, so (like the
        // HLL slice) the oracle checks the CONTRACT: 6 bins, each
        // within 5% of the exact sextile size.
        import org.apache.spark.sql.types.IntegerType
        val fact = Tables(s, dir, "orders")
          .select(col("o_totalprice").cast(DoubleType).as("v"))
        val cuts = fact.agg(
          expr("approx_percentile(v, array(CAST(1 AS DOUBLE)/6, CAST(2 AS DOUBLE)/6, " +
            "CAST(3 AS DOUBLE)/6, CAST(4 AS DOUBLE)/6, CAST(5 AS DOUBLE)/6), 10000)")
            .as("cuts"))
        val binned = fact
          .crossJoin(broadcast(cuts))
          .select((size(filter(col("cuts"), c => col("v") > c)) + 1).as("tile"))
        val binCounts = binned.groupBy(col("tile")).agg(count(lit(1)).as("n"))
        val tot = fact.agg(count(lit(1)).as("total"))
        binCounts
          .crossJoin(broadcast(tot))
          .select(
            col("tile").cast(IntegerType).as("tile"),
            (abs(col("n") - col("total") / 6.0) <= col("total") * 0.05)
              .as("within_tol"))
          .orderBy("tile")
      },
      Some("""SELECT CAST(r AS INTEGER) AS tile, TRUE AS within_tol
        FROM (SELECT unnest(range(1, 7)) AS r) t ORDER BY 1""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_window_running_sum",
      (s, dir) => {
        // Explicit rowsBetween frame: running spend per customer.
        // Decimal accumulation keeps the running sum bit-stable on any
        // partitioning (see ColumnKit determinism recipe).
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir, "orders")
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            sum(col("o_totalprice").cast(D18_4)).over(w)
              .cast(D38_2).cast(DoubleType).as("running_spent")
          )
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
          AS running_spent
        FROM orders ORDER BY o_custkey, o_orderkey""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_window_running_collect",
      (s, dir) => {
        // Ordered collect over a running frame (reference
        // literature/Processing.scala:104-110 collects over an ordered
        // window). Total order (ts, event_id) makes the collected
        // prefix deterministic — including for NULL timestamps, which
        // Spark's asc puts FIRST while DuckDB's default puts last
        // (chaos-gate divergence class): the oracle pins NULLS FIRST
        // to Spark's convention, so time-less events prefix the
        // collect on both engines.
        val w = Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir, "events")
          .select(
            col("user_id"),
            col("event_id"),
            array_join(collect_list(col("event_id").cast("string")).over(w), ",")
              .as("events_so_far")
          )
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
        STRING_AGG(CAST(event_id AS VARCHAR), ',') OVER (
          PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS events_so_far
        FROM events ORDER BY user_id, event_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_window_min_disambig",
      (s, dir) => {
        // Two nested windows feeding a disambiguation filter (reference
        // literature/Grounding.scala:114-129: min over two windows).
        val wPart = Window.partitionBy(col("l_partkey"))
        val wPartFlag = Window.partitionBy(col("l_partkey"), col("l_returnflag"))
        Tables(s, dir, "lineitem")
          .withColumn("first_ship", min(col("l_shipdate")).over(wPart))
          .withColumn("min_qty_flag", min(col("l_quantity")).over(wPartFlag))
          .filter(col("l_shipdate") === col("first_ship"))
          .select(
            col("l_partkey"),
            col("l_orderkey"),
            col("l_linenumber"),
            col("first_ship"),
            col("min_qty_flag")
          )
          .orderBy("l_partkey", "l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_partkey, l_orderkey, l_linenumber, first_ship, min_qty_flag
        FROM (SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
                MIN(l_shipdate) OVER (PARTITION BY l_partkey) AS first_ship,
                MIN(l_quantity) OVER (PARTITION BY l_partkey, l_returnflag) AS min_qty_flag
              FROM lineitem) t
        WHERE l_shipdate = first_ship
        ORDER BY l_partkey, l_orderkey, l_linenumber""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_window_rank_family",
      (s, dir) => {
        // row_number / percent_rank / cume_dist side by side, per
        // nation over customer balances.
        val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        Tables(s, dir, "customer")
          .select(
            col("c_nationkey"),
            col("c_custkey"),
            row_number().over(w).as("rn"),
            // floor-micros instead of round6: percent_rank/cume_dist are
            // exact rationals (rn/n), and Spark rounds the decimal repr
            // while DuckDB rounds the binary double — they disagree at
            // exact 7th-decimal halves (e.g. 333/640). floor(x*1e6) is
            // a pure function of the bit-identical double, so both
            // engines always agree.
            floor(percent_rank().over(w) * 1e6).cast("long").as("pct_rank_micros"),
            floor(cume_dist().over(w) * 1e6).cast("long").as("cume_micros")
          )
          .orderBy("c_nationkey", "rn")
      },
      Some("""SELECT c_nationkey, c_custkey,
        CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
        CAST(FLOOR(PERCENT_RANK() OVER w * 1000000) AS BIGINT) AS pct_rank_micros,
        CAST(FLOOR(CUME_DIST() OVER w * 1000000) AS BIGINT) AS cume_micros
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        ORDER BY c_nationkey, rn""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_window_tumbling_event_time",
      (s, dir) =>
        // Tumbling event-time window over the events stream table — the
        // batch twin of the Structured Streaming windowed aggregation in
        // graft.streaming (same window() semantics there with a
        // watermark). min/max are order-independent doubles -> exact.
        // Event-time policy: a record without a timestamp belongs to
        // no window — Spark's window() generator silently emits no row
        // for it while DuckDB's time_bucket groups it under NULL
        // (chaos-gate divergence class), so both sides filter
        // explicitly; the streaming twin would never admit it past the
        // watermark either.
        Tables(s, dir, "events")
          .filter(col("ts").isNotNull)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value")
          )
          .select(
            col("w.start").as("bucket_start"),
            col("event_type"),
            col("n_events"),
            col("min_value"),
            col("max_value")
          )
          .orderBy("bucket_start", "event_type"),
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start, event_type,
        COUNT(*) AS n_events, MIN(value) AS min_value, MAX(value) AS max_value
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_window_session",
      (s, dir) =>
        // Built-in session_window (gap-based event-time sessions; the
        // batch twin of the flatMapGroupsWithState sessionizer in
        // graft.streaming, which covers the custom-state semantics the
        // built-in can't). A session extends to last_ts + gap,
        // half-open — an event exactly at the end starts a new
        // session. The oracle is the classic gaps-and-islands
        // formulation: new-session flag via LAG >= gap, cumulative-sum
        // island ids, per-island aggregate. Event-time policy (as the
        // tumbling twin): a record without a timestamp belongs to no
        // session — Spark's session_window drops it silently while the
        // oracle's LAG ordering would thread it through a session
        // (chaos-gate divergence class), so both sides filter
        // explicitly.
        Tables(s, dir, "events")
          .filter(col("ts").isNotNull)
          .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
          .agg(
            count(lit(1)).as("n_events"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value")
          )
          .select(
            col("user_id"),
            col("w.start").as("session_start"),
            col("w.end").as("session_end"),
            col("n_events"),
            col("min_value"),
            col("max_value")
          )
          .orderBy("user_id", "session_start"),
      Some("""WITH e AS (
          SELECT user_id, ts, value,
                 CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_s
          FROM events WHERE ts IS NOT NULL),
        g AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                ROWS UNBOUNDED PRECEDING) AS sid FROM e)
        SELECT user_id, MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events, MIN(value) AS min_value, MAX(value) AS max_value
        FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_agg_approx_distinct_bounded",
      (s, dir) =>
        // HLL++ sketch (reference openfda/stage/PrepareSummaryStatistics
        // .scala:38-46, literature/Grounding.scala:198-200 with rsd
        // 0.01). The sketch estimate is engine-specific, so the oracle
        // checks the *contract* — estimate within 10% of exact — which
        // DuckDB states as a constant TRUE column.
        Tables(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(
            countDistinct(col("user_id")).as("n_exact"),
            approx_count_distinct(col("user_id"), rsd = 0.02).as("n_approx")
          )
          .select(
            col("event_type"),
            col("n_exact"),
            (abs(col("n_approx") - col("n_exact")) <= col("n_exact") * 0.1)
              .as("within_10pct")
          )
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
        TRUE AS within_10pct
        FROM events GROUP BY 1 ORDER BY 1""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_dedup_latest_wins",
      (s, dir) => {
        // Latest-version-wins dedup by max timestamp (reference
        // literature/PreProcessing.scala:8-27), deterministic via
        // (ts desc, event_id desc) total order. One shuffle on the
        // dedup key; at 100 TB this is the standard
        // row_number-over-key pattern, skew-safe under AQE.
        val w = Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        Tables(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id, event_type, ts FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
        WHERE rn = 1 ORDER BY user_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_window_sliding_frames",
      (s, dir) => {
        // Explicit frame specs — the §2.5 row the reference leaves on
        // the shelf ("default frames only"): a ROWS frame (moving
        // 3-order spend per customer, rowsBetween(-2, 0) over the
        // unique o_orderkey order) and a RANGE frame (trailing-30-day
        // order count + spend, rangeBetween(-30, 0) over the day
        // number, where same-day peers all enter the frame). Frame
        // sums run on exact DECIMAL then rescale once to double
        // (ColumnKit.decSum recipe) — sliding-window retraction would
        // reassociate a double sum, decimal addition cannot drift.
        val day = datediff(col("o_orderdate").cast("date"), to_date(lit("1992-01-01")))
        // ROWS ordering is (o_orderkey, o_totalprice), not o_orderkey
        // alone: a duplicated order id (chaos-gate divergence class)
        // ties the sort and makes the frame's row admission
        // engine-dependent. With o_totalprice — the ONLY value the
        // frame aggregates — inside the sort key, any remaining tie is
        // between equal-priced rows, whose admission order cannot
        // change the sum: deterministic under arbitrary duplicates.
        val wRows = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderkey"), col("o_totalprice"))
          .rowsBetween(-2, 0)
        val wRange = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
          .rangeBetween(-30, 0)
        Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), day.as("day"))
          .select(
            col("o_orderkey"),
            col("o_custkey"),
            sum(col("o_totalprice").cast(D18_4)).over(wRows)
              .cast(D38_2).cast(DoubleType).as("sum3"),
            count(lit(1)).over(wRange).as("n30"),
            sum(col("o_totalprice").cast(D18_4)).over(wRange)
              .cast(D38_2).cast(DoubleType).as("sum30")
          )
          .orderBy("o_orderkey")
      },
      Some("""WITH o AS (
          SELECT o_orderkey, o_custkey, o_totalprice,
                 date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day
          FROM orders)
        SELECT o_orderkey, o_custkey,
          CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderkey, o_totalprice
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS sum3,
          COUNT(*) OVER (
            PARTITION BY o_custkey ORDER BY day
            RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n30,
          CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
            PARTITION BY o_custkey ORDER BY day
            RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS sum30
        FROM o ORDER BY o_orderkey""")
    )
  )
}
