package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, IntegerType, LongType}

import graft.functions.ColumnKit

/** Scalar-function slices (SURVEY.md §2.8): the string / date / math /
  * conditional / map / JSON / array column library, plus melt and the
  * array_contains theta join. Everything here is a pure projection or
  * a single-shuffle aggregate — codegen'd built-ins only, no UDFs.
  */
object ScalarQueries {

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    QueryDef(
      "q_scalar_string_kit",
      (s, dir) =>
        // The reference's string toolkit in one projection: concat_ws,
        // substring_index, translate, regexp_extract/replace, split,
        // lower/upper/length/trim (SURVEY.md §2.8 string row).
        Tables(s, dir, "part")
          .select(
            col("p_partkey"),
            concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
            substring_index(col("p_brand"), "#", -1).cast(LongType).as("brand_num"),
            upper(col("p_name")).as("name_upper"),
            length(col("p_name")).as("name_len"),
            translate(col("p_name"), "aeiou", "AEIOU").as("name_tr"),
            regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
            regexp_replace(col("p_name"), "[aeiou]", "*").as("name_starred"),
            array_join(split(col("p_name"), " "), "-").as("name_dashed"),
            lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
            trim(concat(lit("  "), col("p_type"), lit("  "))).as("type_trimmed")
          )
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
        CONCAT_WS('|', p_brand, p_type) AS brand_type,
        CAST(CASE WHEN p_brand IS NULL THEN NULL
                  ELSE SPLIT_PART(p_brand, '#', 2) END AS BIGINT) AS brand_num,
        UPPER(p_name) AS name_upper,
        CAST(LENGTH(p_name) AS INTEGER) AS name_len,
        TRANSLATE(p_name, 'aeiou', 'AEIOU') AS name_tr,
        REGEXP_EXTRACT(p_name, '^(\w+)', 1) AS first_word,
        REGEXP_REPLACE(p_name, '[aeiou]', '*', 'g') AS name_starred,
        ARRAY_TO_STRING(STRING_SPLIT(p_name, ' '), '-') AS name_dashed,
        LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
        TRIM('  ' || p_type || '  ') AS type_trimmed
        FROM part ORDER BY p_partkey""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_scalar_date_kit",
      (s, dir) =>
        // Date kit (reference literature/Grounding.scala:349-354 year/
        // month/dayofmonth; PreProcessing.scala:19 unix_timestamp).
        Tables(s, dir, "orders")
          .select(
            col("o_orderkey"),
            unix_timestamp(col("o_orderdate")).as("epoch_s"),
            year(col("o_orderdate")).as("y"),
            quarter(col("o_orderdate")).as("q"),
            month(col("o_orderdate")).as("m"),
            dayofmonth(col("o_orderdate")).as("d"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            last_day(col("o_orderdate")).as("month_end"),
            datediff(col("o_orderdate").cast(DateType), lit("1995-01-01").cast(DateType))
              .as("days_since_epoch_start"),
            date_add(col("o_orderdate").cast(DateType), 30).as("due_date")
          )
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS epoch_s,
        CAST(YEAR(o_orderdate) AS INTEGER) AS y,
        CAST(QUARTER(o_orderdate) AS INTEGER) AS q,
        CAST(MONTH(o_orderdate) AS INTEGER) AS m,
        CAST(DAY(o_orderdate) AS INTEGER) AS d,
        CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
        LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
        CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_epoch_start,
        CAST(o_orderdate AS DATE) + 30 AS due_date
        FROM orders ORDER BY o_orderkey""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_scalar_math_conditional",
      (s, dir) =>
        // when/otherwise chains + coalesce/nullif + math library
        // (reference Search.scala:203-247 conditionals; log1p at
        // Search.scala:290,425,558; pow at Helpers.scala:264).
        Tables(s, dir, "lineitem")
          .filter(col("l_quantity") >= 45)
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            when(col("l_returnflag") === "R", lit(-1))
              .when(col("l_returnflag") === "A", lit(0))
              .otherwise(lit(1)).as("flag_score"),
            coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag_or_none"),
            greatest(col("l_quantity"), col("l_discount") * 100).as("biggest"),
            round(log1p(col("l_quantity")), 6).as("log1p_qty"),
            round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
            round(pow(col("l_discount"), 2), 6).as("disc_sq"),
            pmod(col("l_orderkey"), lit(7)).as("key_mod7"),
            floor(col("l_extendedprice")).as("price_floor"),
            ceil(col("l_extendedprice")).as("price_ceil"),
            signum(col("l_quantity") - 50).cast(IntegerType).as("qty_sign")
          )
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
        CASE WHEN l_returnflag = 'R' THEN -1 WHEN l_returnflag = 'A' THEN 0 ELSE 1 END AS flag_score,
        COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
        GREATEST(l_quantity, l_discount * 100) AS biggest,
        ROUND(LN(1 + l_quantity), 6) AS log1p_qty,
        ROUND(SQRT(l_extendedprice), 6) AS sqrt_price,
        ROUND(POW(l_discount, 2), 6) AS disc_sq,
        l_orderkey % 7 AS key_mod7,
        CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
        CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
        CAST(SIGN(l_quantity - 50) AS INT) AS qty_sign
        FROM lineitem WHERE l_quantity >= 45
        ORDER BY l_orderkey, l_linenumber""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_map_literal_lookup",
      (s, dir) => {
        // Literal map column as a lookup function (reference
        // backend/Expression.scala:21-51, searchFacet/TargetFacets
        // .scala:39-46): a broadcast-free dimension decode that stays
        // inside codegen.
        val abbrev = typedLit(Map(
          "AFRICA" -> "AF", "AMERICA" -> "AM", "ASIA" -> "AS",
          "EUROPE" -> "EU", "MIDDLE EAST" -> "ME"
        ))
        Tables(s, dir, "nation")
          .join(broadcast(Tables(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .select(
            col("n_nationkey"),
            col("n_name"),
            abbrev(col("r_name")).as("region_code")
          )
          .orderBy("n_nationkey")
      },
      Some("""SELECT n_nationkey, n_name,
        CASE r_name WHEN 'AFRICA' THEN 'AF' WHEN 'AMERICA' THEN 'AM'
          WHEN 'ASIA' THEN 'AS' WHEN 'EUROPE' THEN 'EU'
          WHEN 'MIDDLE EAST' THEN 'ME' END AS region_code
        FROM nation JOIN region ON n_regionkey = r_regionkey
        ORDER BY n_nationkey""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_map_function_kit",
      (s, dir) => {
        // Dynamic map-column surface beyond the literal lookup:
        // map_from_entries over sorted collected pairs, then the map
        // higher-order functions — transform_values, map_filter,
        // map_zip_with — plus map_keys/map_values folds. All integer
        // math, so every derived value is engine-exact; the oracle
        // computes the same results relationally (DuckDB's map surface
        // differs, the VALUES must not).
        val q = Tables(s, dir, "lineitem")
          // a NULL line number cannot be a map key — map_from_entries
          // throws NULL_MAP_KEY in BOTH dialects (chaos-gate crash
          // class: the hostile all-NULL lineitem row). Keyless rows
          // carry no per-line fact; drop them, mirrored in the oracle.
          .filter(col("l_linenumber").isNotNull)
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            floor(col("l_quantity")).cast("long").as("qv")
          )
          // line numbers repeat within an order in this corpus; map
          // keys must be unique, so pre-aggregate per key first
          .groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(sum(col("qv")).as("qv"))
          .groupBy(col("l_orderkey"))
          .agg(
            map_from_entries(
              sort_array(collect_list(struct(col("l_linenumber"), col("qv"))))
            ).as("qmap")
          )
        q.withColumn("doubled", transform_values(col("qmap"), (_, v) => v * 2))
          .withColumn(
            "zipped",
            map_zip_with(col("qmap"), col("doubled"), (_, a, b) => b - a)
          )
          .select(
            col("l_orderkey"),
            size(col("qmap")).as("n_lines"),
            array_join(transform(map_keys(col("qmap")), _.cast("string")), ",").as("line_keys"),
            aggregate(map_values(col("doubled")), lit(0L), _ + _).as("total_doubled"),
            size(map_filter(col("qmap"), (_, v) => v >= 25)).as("n_big"),
            aggregate(map_values(col("zipped")), lit(0L), _ + _).as("total_zip")
          )
          .orderBy("l_orderkey")
      },
      Some("""WITH q AS (
          SELECT l_orderkey, l_linenumber,
                 CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS qv
          FROM lineitem WHERE l_linenumber IS NOT NULL GROUP BY 1, 2)
        SELECT l_orderkey,
          CAST(COUNT(*) AS INTEGER) AS n_lines,
          STRING_AGG(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS line_keys,
          CAST(SUM(qv * 2) AS BIGINT) AS total_doubled,
          CAST(COUNT(CASE WHEN qv >= 25 THEN 1 END) AS INTEGER) AS n_big,
          CAST(SUM(qv) AS BIGINT) AS total_zip
        FROM q GROUP BY 1 ORDER BY 1""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_json_extract",
      (s, dir) =>
        // JSON column extraction. The reference parses JSON only at
        // scan level (SURVEY.md §2.8); we also cover the column-level
        // path since events.props is a JSON string payload.
        // Malformed-JSON policy (chaos-gate crash class): Spark's
        // get_json_object returns NULL for unparseable input; the
        // oracle's regexp extraction naturally misses it, and its cast
        // is TRY_CAST so an empty extraction can never throw. The
        // pattern accepts negative values — `(\d+)` alone silently
        // NULLed a k of -3 while Spark parsed it.
        Tables(s, dir, "events")
          .select(
            col("event_type"),
            get_json_object(col("props"), "$.k").cast(IntegerType).as("k")
          )
          .groupBy(col("event_type"))
          .agg(
            sum(col("k")).as("sum_k"),
            count(when(col("k") > 50, 1)).as("n_high")
          )
          .orderBy("event_type"),
      Some("""SELECT event_type,
        CAST(SUM(k) AS BIGINT) AS sum_k,
        COUNT(CASE WHEN k > 50 THEN 1 END) AS n_high
        FROM (SELECT event_type,
                TRY_CAST(REGEXP_EXTRACT(props, '"k": (-?\d+)', 1) AS INT) AS k
              FROM events) t
        GROUP BY 1 ORDER BY 1""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_unpivot_melt",
      (s, dir) => {
        // Wide -> long melt (reference transposeDataframe,
        // Helpers.scala:186-200, used at Expression.scala:70-72) via
        // Spark 4's built-in unpivot.
        val perNationCust = Tables(s, dir, "customer")
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        val perNationSupp = Tables(s, dir, "supplier")
          .groupBy(col("s_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_supp"))
        val wide = perNationCust
          .join(perNationSupp, Seq("nationkey"), "full_outer")
          .na.fill(0L, Seq("n_cust", "n_supp"))
        ColumnKit.melt(wide, Seq("nationkey"), Seq("n_cust", "n_supp"), "metric", "value")
          .orderBy("nationkey", "metric")
      },
      Some("""WITH wide AS (
          SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
                 COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
          FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
          FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
          USING (nationkey))
        SELECT nationkey, 'n_cust' AS metric, n_cust AS value FROM wide
        UNION ALL
        SELECT nationkey, 'n_supp', n_supp FROM wide
        ORDER BY nationkey, metric""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_array_zip_explode",
      (s, dir) => {
        // Array round-trip: collect_list(struct) -> array_sort ->
        // transform -> arrays_zip -> explode reproduces the input rows
        // (reference array motifs: ProteinClassification.scala:28-31
        // arrays_zip; Ensembl.scala:96-114 indexed array surgery).
        val grouped = Tables(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(struct(col("l_linenumber"), col("l_extendedprice")))).as("items"))
          .select(
            col("l_orderkey"),
            transform(col("items"), x => x.getField("l_linenumber")).as("ln"),
            transform(col("items"), x => x.getField("l_extendedprice")).as("price")
          )
        grouped
          .select(col("l_orderkey"), explode(arrays_zip(col("ln"), col("price"))).as("z"))
          .select(
            col("l_orderkey"),
            col("z.ln").as("l_linenumber"),
            col("z.price").as("l_extendedprice")
          )
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem ORDER BY l_orderkey, l_linenumber""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_theta_array_contains",
      (s, dir) => {
        // Membership theta join (reference target/Target.scala:432,
        // target/Safety.scala:64: join(lut, array_contains(arrayCol,
        // key))). The LUT side is broadcast, so the non-equi condition
        // runs as a broadcast nested-loop join — never a cartesian
        // shuffle.
        val parts = Tables(s, dir, "part")
          .select(col("p_partkey"), array_distinct(split(col("p_name"), " ")).as("words"))
        val lut = Tables(s, dir, "part")
          .select(explode(split(col("p_name"), " ")).as("word"))
          .distinct()
        parts
          .join(broadcast(lut), array_contains(col("words"), col("word")))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("n_parts"))
          .orderBy("word")
      },
      Some("""SELECT w AS word, COUNT(*) AS n_parts
        FROM (SELECT p_partkey, UNNEST(LIST_DISTINCT(STRING_SPLIT(p_name, ' '))) AS w
              FROM part) t
        GROUP BY 1 ORDER BY 1""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_struct_nest_flatten",
      (s, dir) => {
        // Struct nesting + nested-star expansion (reference `nest`
        // Helpers.scala:310-318; selectExpr("*","match.*") Grounding
        // .scala:231; select("col.*") Hgnc.scala:26).
        val nested = ColumnKit.nest(
          Tables(s, dir, "supplier"),
          Seq("s_name", "s_acctbal"),
          "info"
        )
        nested
          .withColumn("info", col("info").withField("acct_rounded", round(col("info.s_acctbal"), 0)))
          .select(col("s_suppkey"), col("s_nationkey"), col("info.*"))
          .orderBy("s_suppkey")
      },
      Some("""SELECT s_suppkey, s_nationkey, s_name, s_acctbal,
        ROUND(s_acctbal, 0) AS acct_rounded
        FROM supplier ORDER BY s_suppkey""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_array_sort_comparator",
      (s, dir) => {
        // 2-arg array_sort with a SQL-registered UDF comparator inside
        // the lambda (reference target/Target.scala:331-334,358-361:
        // speciesDistanceSort registered then used in array_sort SQL).
        // Comparator: by (length asc, lexicographic asc).
        s.udf.register(
          "len_name_cmp",
          (x: String, y: String) => {
            val c = Integer.compare(x.length, y.length)
            if (c != 0) c else x.compareTo(y)
          }
        )
        Tables(s, dir, "part")
          .groupBy(col("p_brand"))
          .agg(collect_list(col("p_name")).as("names"))
          .selectExpr(
            "p_brand",
            "array_join(array_sort(names, (x, y) -> len_name_cmp(x, y)), ',') AS names_by_len"
          )
          .orderBy("p_brand")
      },
      Some("""SELECT p_brand,
          -- COALESCE: STRING_AGG over a group whose every name is NULL
          -- (hostile part row) is NULL, while Spark's collect_list
          -- drops the NULLs and array_join renders ''
          COALESCE(STRING_AGG(p_name, ',' ORDER BY LENGTH(p_name), p_name), '')
            AS names_by_len
        FROM part GROUP BY 1 ORDER BY 1""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_na_fill_drop",
      (s, dir) => {
        // DataFrameNaFunctions (reference literature/Processing
        // .scala:99-103 na.fill with per-column defaults).
        val perCust = Tables(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("cnt"))
        Tables(s, dir, "customer")
          .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
          .select(col("c_custkey"), col("c_mktsegment"), col("cnt"))
          .na.fill(Map("cnt" -> -1L))
          .groupBy(col("c_mktsegment"), col("cnt"))
          .agg(count(lit(1)).as("n"))
          .filter(col("cnt") === -1)
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, CAST(-1 AS BIGINT) AS cnt, COUNT(*) AS n
        FROM customer WHERE NOT EXISTS
          (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY 1 ORDER BY 1""")
    )
  )
}
