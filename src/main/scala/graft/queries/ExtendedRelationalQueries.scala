package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.operators.AsOfJoin
import OracleSql.decSumExpr

/** Relational surface beyond the reference's own operator set: as-of
  * join (custom operator — Spark lacks it), rollup grouping, pivot
  * (the reference only has the melt direction, SURVEY.md §2.8).
  */
object ExtendedRelationalQueries {

  /** KMV sketch size for q_agg_kmv_distinct — interpolated into BOTH
    * the Spark aggregator and the oracle SQL so they cannot drift.
    */
  private val KmvK = 64

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    QueryDef(
      "q_join_asof",
      (s, dir) => {
        // For every click, the user's most recent view at-or-before it
        // (graft.operators.AsOfJoin: union + running-last, one shuffle).
        // DuckDB verifies with its native ASOF LEFT JOIN.
        // Event-time policy (chaos-gate divergence class): a RIGHT row
        // without a timestamp can never be "the most recent at-or-
        // before" — both Spark implementations would order NULL ts
        // first (match-eligible as if -infinity) while DuckDB's ASOF
        // sorts it last, so time-less views are EXCLUDED explicitly; a
        // LEFT row without a timestamp is carried with a NULL match
        // (the oracle routes NULL-ts clicks around the ASOF join via
        // UNION ALL, because DuckDB's ASOF comparison treats the NULL
        // left ts as larger than every view — it matched the newest
        // view, judged wrong on both engines' own NULL-comparison
        // semantics). The UNION ALL form — not an event_id join-back —
        // also keeps the oracle row-per-click under DUPLICATE click
        // event_ids (advisor r10: a join-back keyed on event_id would
        // fan a duplicated click out to 4 rows where both Spark
        // implementations emit one row per input row; the chaos
        // fixture now carries such a row).
        val ev = Tables(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = ev.filter(col("event_type") === "view" && col("ts").isNotNull)
          .select(col("user_id"), col("event_id").as("view_id"), col("ts"), col("value"))
        AsOfJoin.leftAsOf(clicks, views, Seq("user_id"), "ts", "ts")
          .select(
            col("event_id"),
            col("user_id"),
            col("matched").getField("view_id").as("last_view_id"),
            col("matched").getField("value").as("last_view_value")
          )
          .orderBy("event_id")
      },
      Some("""WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        views AS (SELECT user_id, event_id AS view_id, ts, value FROM events
                  WHERE event_type = 'view' AND ts IS NOT NULL),
        m AS (SELECT c.event_id, c.user_id, v.view_id, v.value
              FROM (SELECT * FROM clicks WHERE ts IS NOT NULL) c
              ASOF LEFT JOIN views v ON c.user_id = v.user_id AND c.ts >= v.ts)
        SELECT event_id, user_id, view_id AS last_view_id, value AS last_view_value FROM m
        UNION ALL
        SELECT event_id, user_id, NULL, NULL FROM clicks WHERE ts IS NULL
        ORDER BY event_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_join_range_interval",
      (s, dir) => {
        // Interval-containment join via binned equi-join
        // (graft.operators.RangeJoin): 45-day demand windows anchored
        // at each order month, counting lineitem shipments inside each
        // window. The oracle states the same range predicate directly.
        val windows = Tables(s, dir, "orders")
          .select(date_trunc("month", col("o_orderdate")).as("win_start"))
          .distinct()
          .withColumn("win_end", col("win_start") + expr("INTERVAL 45 DAYS"))
        val shipments = Tables(s, dir, "lineitem").select(col("l_shipdate"))
        graft.operators.RangeJoin
          .pointInInterval(shipments, "l_shipdate", windows, "win_start", "win_end",
            binSeconds = 45L * 86400)
          .groupBy(col("win_start"))
          .agg(count(lit(1)).as("n_shipped"))
          .orderBy("win_start")
      },
      Some("""WITH w AS (SELECT DISTINCT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS win_start
                FROM orders)
        SELECT win_start, COUNT(*) AS n_shipped
        FROM w JOIN lineitem
          ON l_shipdate >= win_start AND l_shipdate < win_start + INTERVAL 45 DAY
        GROUP BY 1 ORDER BY 1""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_agg_rollup",
      (s, dir) => {
        // Rollup grouping (region -> nation -> grand total). Keys are
        // never null in the data, so null marks the rollup level —
        // folded to 'ALL' for a grouping-function-free oracle.
        val D18_4 = DecimalType(18, 4)
        val D38_2 = DecimalType(38, 2)
        Tables(s, dir, "customer")
          .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(
            count(lit(1)).as("n_cust"),
            sum(col("c_acctbal").cast(D18_4)).cast(D38_2).cast(DoubleType).as("total_bal")
          )
          .select(
            coalesce(col("r_name"), lit("ALL")).as("region"),
            coalesce(col("n_name"), lit("ALL")).as("nation"),
            col("n_cust"),
            col("total_bal")
          )
          .orderBy("region", "nation")
      },
      Some("""SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
          COUNT(*) AS n_cust,
          CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY region, nation""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_pivot_segment_year",
      (s, dir) =>
        // Pivot (the wide direction the reference lacks): order counts
        // per market segment x order year, years as columns. The value
        // list is explicit, so the plan is a single pass with
        // conditional aggregates — same shape as the oracle.
        Tables(s, dir, "orders")
          .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"), year(col("o_orderdate")).as("y"))
          .groupBy(col("c_mktsegment"))
          .pivot("y", Seq(1995, 1996, 1997, 1998, 1999, 2000, 2001))
          .count()
          .na.fill(0L)
          .withColumnsRenamed((1995 to 2001).map(y => y.toString -> s"y$y").toMap)
          .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment,
          COUNT(CASE WHEN YEAR(o_orderdate) = 1995 THEN 1 END) AS y1995,
          COUNT(CASE WHEN YEAR(o_orderdate) = 1996 THEN 1 END) AS y1996,
          COUNT(CASE WHEN YEAR(o_orderdate) = 1997 THEN 1 END) AS y1997,
          COUNT(CASE WHEN YEAR(o_orderdate) = 1998 THEN 1 END) AS y1998,
          COUNT(CASE WHEN YEAR(o_orderdate) = 1999 THEN 1 END) AS y1999,
          COUNT(CASE WHEN YEAR(o_orderdate) = 2000 THEN 1 END) AS y2000,
          COUNT(CASE WHEN YEAR(o_orderdate) = 2001 THEN 1 END) AS y2001
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY 1""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_agg_cube",
      (s, dir) => {
        // Cube grouping (all 4 combinations of segment x status) with
        // grouping_id — completes the grouping-sets surface next to
        // rollup and pivot. grouping_id's bit encoding (1 bit per cube
        // column, MSB = first column) matches DuckDB's GROUPING()
        // exactly; keys are never null in the data, so the 'ALL' fold
        // is unambiguous.
        Tables(s, dir, "orders")
          .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .cube(col("c_mktsegment"), col("o_orderstatus"))
          .agg(grouping_id().as("gid"), count(lit(1)).as("n_orders"))
          .select(
            coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            col("gid"),
            col("n_orders")
          )
          .orderBy("segment", "status")
      },
      Some("""SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
          COALESCE(o_orderstatus, 'ALL') AS status,
          CAST(GROUPING(c_mktsegment, o_orderstatus) AS BIGINT) AS gid,
          COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY CUBE (c_mktsegment, o_orderstatus)
        ORDER BY segment, status""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_agg_salted_skew",
      (s, dir) => {
        // Salted two-phase aggregation under REAL skew: l_returnflag
        // has 3 values over the whole fact table, so a plain groupBy
        // funnels everything through 3 reducers. ColumnKit.saltedSum
        // spreads each hot key over 16 deterministic salts (phase 1),
        // then merges 48 partials (phase 2). Exact-decimal money math
        // makes the result bit-identical to the unsalted plan, which is
        // exactly what the oracle computes.
        graft.functions.ColumnKit
          .saltedSum(
            Tables(s, dir, "lineitem"),
            keyCols = Seq("l_returnflag"),
            valueCol = "l_extendedprice",
            saltFrom = "l_orderkey"
          )
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
          CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
            AS sum_l_extendedprice
        FROM lineitem GROUP BY 1 ORDER BY 1""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_sample_stratified",
      (s, dir) => {
        // Stratified sampling (reference openfda/stage/
        // StratifiedSampling.scala:32-36: seeded sample + full-outer
        // QA compare): sampleBy draws each stratum independently at
        // 20%. Per-partition seeded Bernoulli draws are not portable
        // across engines, so the oracle is a CONTRACT check (like the
        // HLL slice): each stratum's sampled count must sit within
        // ±50% of expectation — >5 sigma at every test scale — and the
        // check itself is computed in Spark so a broken sampler turns
        // the boolean false and fails the hash compare.
        val fractions = Map("O" -> 0.2, "F" -> 0.2, "P" -> 0.2)
        val sampled = Tables(s, dir, "orders")
          .stat.sampleBy("o_orderstatus", fractions, seed = 42L)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_sampled"))
        // Bounds are FRACTION-AWARE, not hardcoded 0.2-derived: a
        // stratum outside the fractions map (a hostile novel status —
        // chaos-gate divergence class) is sampled at 0 by sampleBy, so
        // its expectation is 0 and 0 sampled rows IS in range; the
        // hardcoded [0.1, 0.3]*n bounds wrongly failed it.
        val fracOf = coalesce(
          element_at(typedLit(fractions), col("o_orderstatus")), lit(0.0))
        Tables(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_total"))
          .join(sampled, Seq("o_orderstatus"), "left_outer")
          .select(
            col("o_orderstatus"),
            (coalesce(col("n_sampled"), lit(0L)) >= col("n_total") * fracOf * 0.5 &&
              coalesce(col("n_sampled"), lit(0L)) <= col("n_total") * fracOf * 1.5)
              .as("in_range")
          )
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, TRUE AS in_range
        FROM orders GROUP BY 1 ORDER BY 1""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_join_asof_native",
      (s, dir) => {
        // The SAME as-of semantics as q_join_asof, but through the
        // full custom-operator stack (graft.plans.AsOfJoinNative:
        // LogicalPlan node -> planner Strategy -> co-partitioned
        // sorted-merge SparkPlan). One hash exchange per side, a sort,
        // and an O(|L|+|R|) per-partition merge — no union, no window
        // state. Verified against the identical DuckDB ASOF LEFT JOIN
        // oracle as the composed version, with the same event-time
        // policy (see q_join_asof): time-less right rows excluded,
        // time-less left rows carried unmatched.
        val ev = Tables(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = ev.filter(col("event_type") === "view" && col("ts").isNotNull)
          .select(col("user_id"), col("event_id").as("view_id"),
            col("ts").as("view_ts"), col("value"))
        graft.plans.AsOfJoinNative
          .leftAsOf(clicks, views, Seq("user_id"), "ts", "view_ts")
          .select(
            col("event_id"),
            col("user_id"),
            col("view_id").as("last_view_id"),
            col("value").as("last_view_value")
          )
          .orderBy("event_id")
      },
      Some("""WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        views AS (SELECT user_id, event_id AS view_id, ts, value FROM events
                  WHERE event_type = 'view' AND ts IS NOT NULL),
        m AS (SELECT c.event_id, c.user_id, v.view_id, v.value
              FROM (SELECT * FROM clicks WHERE ts IS NOT NULL) c
              ASOF LEFT JOIN views v ON c.user_id = v.user_id AND c.ts >= v.ts)
        SELECT event_id, user_id, view_id AS last_view_id, value AS last_view_value FROM m
        UNION ALL
        SELECT event_id, user_id, NULL, NULL FROM clicks WHERE ts IS NULL
        ORDER BY event_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_join_udf_key",
      (s, dir) => {
        // Equi-join on a UDF-TRANSFORMED key (reference
        // backend/Interaction.scala:153-155,228-237: getCodeFcn
        // truncates 'uniprotkb:P12345-2' to its code before joining
        // the mapping LUT). The key expression is evaluated before
        // partitioning, so Catalyst still plans a hash join — the UDF
        // only costs its per-row call, not the join strategy
        // (PlanAuditSpec enforces no nested-loop fallback). Analogue:
        // p_brand 'Brand#xy' -> numeric code, joined to a broadcast
        // code->label LUT.
        val codeOf = udf((brand: String) =>
          if (brand == null) null else brand.dropWhile(!_.isDigit))
        val lut = Tables(s, dir, "part")
          .select(substring_index(col("p_brand"), "#", -1).as("code"))
          .distinct()
          .select(col("code"), concat(lit("B"), col("code")).as("brand_label"))
        Tables(s, dir, "part")
          .join(broadcast(lut), codeOf(col("p_brand")) === col("code"))
          .groupBy(col("brand_label"))
          .agg(count(lit(1)).as("n_parts"), min(col("p_partkey")).as("first_part"))
          .orderBy("brand_label")
      },
      Some("""WITH lut AS (
          SELECT DISTINCT string_split(p_brand, '#')[2] AS code FROM part),
        l AS (SELECT code, 'B' || code AS brand_label FROM lut)
        SELECT brand_label, COUNT(*) AS n_parts, MIN(p_partkey) AS first_part
        FROM part JOIN l ON regexp_replace(p_brand, '^[^0-9]*', '') = code
        GROUP BY 1 ORDER BY 1""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_zorder_layout",
      (s, dir) => {
        // Z-order layout key (functions.Layout.zorder2, the Morton
        // interleave behind lakehouse OPTIMIZE ZORDER): two bounded
        // dimension keys interleaved bit-by-bit so that writing in
        // zval order clusters BOTH dimensions — per-file min/max
        // ranges stay tight on each, and range predicates on either
        // column prune the scan (the single-dimension sort only prunes
        // its leading column). Pure codegen'd integer bit ops; the
        // oracle replays the identical interleave. The locality win is
        // quantified in LayoutSpec.
        import graft.functions.Layout
        val x = pmod(col("p_partkey"), lit(1024)).cast("int")
        val y = pmod(floor(col("p_retailprice")).cast("long"), lit(1024)).cast("int")
        Tables(s, dir, "part")
          .select(
            col("p_partkey"),
            x.as("x"),
            y.as("y"),
            Layout.zorder2(x, y, bits = 10).cast("int").as("zval")
          )
          .orderBy("zval", "p_partkey")
      },
      Some(s"""WITH d AS (
          SELECT p_partkey,
                 CAST(p_partkey % 1024 AS INTEGER) AS x,
                 -- POSITIVE modulus ((v %% m) + m) %% m: Spark's pmod is
                 -- sign-positive while DuckDB's %% keeps the dividend's
                 -- sign — a hostile NEGATIVE price (chaos part) diverged
                 -- (-1 vs 1023) under the bare %%
                 CAST(((CAST(FLOOR(p_retailprice) AS BIGINT) % 1024) + 1024) % 1024
                      AS INTEGER) AS y
          FROM part)
        SELECT p_partkey, x, y,
               CAST(${graft.functions.Layout.zorder2Sql("x", "y", bits = 10)} AS INTEGER) AS zval
        FROM d ORDER BY zval, p_partkey""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_agg_kmv_distinct",
      (s, dir) => {
        // KMV distinct-count sketch as a typed Aggregator (functions.
        // KmvSketch) — the UDAF rung of the extension ladder, next to
        // the HLL contract check (q_agg_approx_distinct_bounded).
        // Distinct customers per order priority, estimated from the 64
        // smallest portable hashes per group. The buffer merges by
        // sorted-merge-take-k, so map-side partials compose exactly —
        // and because every step is portable arithmetic, the oracle
        // replays the ESTIMATE bit-for-bit (row_number over distinct
        // hashes picks the same k-th value), not a tolerance band.
        import graft.functions.{KmvSketch, TextKit}
        import org.apache.spark.sql.Encoders
        val kmv = udaf(new KmvSketch(KmvK, TextKit.HashP), Encoders.scalaLong)
        val hv = TextKit.charHash(concat(col("o_custkey").cast("string"), lit("#kmv")))
        Tables(s, dir, "orders")
          // a NULL custkey is no distinct-count observation on either
          // path (countDistinct already skips it; the sketch must see
          // the same stream) — filtered before the group, mirrored in
          // the oracle (chaos-gate divergence class)
          .filter(col("o_custkey").isNotNull)
          .select(col("o_orderpriority"), col("o_custkey"), hv.as("hv"))
          .groupBy(col("o_orderpriority"))
          .agg(
            countDistinct(col("o_custkey")).as("n_exact"),
            floor(kmv(col("hv")) * lit(1e6)).cast("long").as("kmv_micros")
          )
          .orderBy("o_orderpriority")
      },
      Some(s"""WITH h AS (
          SELECT o_orderpriority, o_custkey,
                 ${OracleSql.foldSql("CAST(o_custkey AS VARCHAR) || '#kmv'", 31)} AS hv
          FROM orders WHERE o_custkey IS NOT NULL),
        d AS (SELECT DISTINCT o_orderpriority, hv FROM h),
        r AS (SELECT o_orderpriority, hv,
                     ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY hv) AS rn
              FROM d),
        agg AS (SELECT o_orderpriority,
                       COUNT(*) AS nd,
                       MAX(CASE WHEN rn = $KmvK THEN hv END) AS kth
                FROM r GROUP BY 1),
        ex AS (SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_exact
               FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1)
        SELECT ex.o_orderpriority, ex.n_exact,
               CAST(FLOOR(CASE WHEN agg.nd < $KmvK THEN CAST(agg.nd AS DOUBLE)
                               ELSE ${KmvK - 1}.0 * ${graft.functions.TextKit.HashP} / agg.kth
                          END * 1000000.0) AS BIGINT)
                 AS kmv_micros
        FROM ex JOIN agg
          ON ex.o_orderpriority IS NOT DISTINCT FROM agg.o_orderpriority
        ORDER BY ex.o_orderpriority""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_quality_audit",
      (s, dir) => {
        // Constraint-audit report (the write-audit-publish gate a
        // production pipeline runs before promoting a table; the
        // reference's validateDF checks only column presence,
        // Helpers.scala:327-333): row count, key uniqueness,
        // completeness, value range, enum domain, date bounds — ALL
        // from ONE aggregation pass over the table (conditional sums,
        // no per-check scans), then stack()ed into one report row per
        // check. Metrics are exact integers (money as cents), so the
        // report is engine-portable without float care.
        val m = Tables(s, dir, "orders").agg(
          count(lit(1)).as("n"),
          countDistinct(col("o_orderkey")).as("n_key"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_cust"),
          floor(min(col("o_totalprice")) * 100).cast("long").as("min_price_cents"),
          sum(when(col("o_orderstatus").isin("O", "F", "P"), 0L).otherwise(1L)).as("bad_status"),
          sum(when(col("o_orderdate") < lit("1992-01-01").cast("timestamp") ||
                   col("o_orderdate") >= lit("1999-01-01").cast("timestamp"), 1L)
            .otherwise(0L)).as("bad_date")
        )
        m.select(expr(
            """stack(6,
              |  'completeness_custkey', null_cust, null_cust = 0,
              |  'date_in_bounds', bad_date, bad_date = 0,
              |  'min_price_nonneg', min_price_cents, min_price_cents >= 0,
              |  'row_count', n, n > 0,
              |  'status_in_domain', bad_status, bad_status = 0,
              |  'unique_orderkey', n_key, n_key = n
              |) AS (check_name, metric, passed)""".stripMargin))
          .orderBy("check_name")
      },
      Some("""WITH m AS (
          SELECT COUNT(*) AS n,
                 COUNT(DISTINCT o_orderkey) AS n_key,
                 CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cust,
                 CAST(FLOOR(MIN(o_totalprice) * 100) AS BIGINT) AS min_price_cents,
                 CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS BIGINT) AS bad_status,
                 CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
                                 OR o_orderdate >= TIMESTAMP '1999-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS bad_date
          FROM orders)
        SELECT check_name, metric, passed FROM (
          SELECT 'completeness_custkey' AS check_name, null_cust AS metric, null_cust = 0 AS passed FROM m
          UNION ALL SELECT 'date_in_bounds', bad_date, bad_date = 0 FROM m
          UNION ALL SELECT 'min_price_nonneg', min_price_cents, min_price_cents >= 0 FROM m
          UNION ALL SELECT 'row_count', n, n > 0 FROM m
          UNION ALL SELECT 'status_in_domain', bad_status, bad_status = 0 FROM m
          UNION ALL SELECT 'unique_orderkey', n_key, n_key = n FROM m)
        ORDER BY check_name""")
    )
  )
}
