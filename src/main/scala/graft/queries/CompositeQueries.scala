package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.TextKit
import OracleSql.revTerm

/** Composite pipelines mirroring the reference's two flagship step
  * shapes (SURVEY.md §7.1 step 4):
  *  - search-index build (backend/Search.scala:98-293): per-entity
  *    top-k related entities collected inside the aggregate, relevance
  *    multiplier log1p(x)+1;
  *  - grounding (literature/Grounding.scala): normalize -> stopword
  *    removal -> entity-LUT broadcast join -> dense_rank
  *    disambiguation.
  */
object CompositeQueries {

  private val D38_2 = DecimalType(38, 2)

  /** Full-fidelity Search-step shape (reference Search.scala:98-180
    * setIdAndSelectFromTargets + 600-660 the study-index global
    * max-rank fold): multi-LUT assembly (two label LUTs joined into
    * the association table), a cascaded top-50/25/5 rank window whose
    * tiers are collected IN ONE aggregate via
    * collect_list(when(rank <= k, labels)) + array_distinct(flatten),
    * and the global max-rank driver fold feeding the relevance
    * multiplier 1 + (max-rank)/(max-1).
    *
    * Analogue mapping: target=part, association=(part, customer)
    * revenue cell, disease-LUT=customer segment+nation labels,
    * drug-LUT=supplier nation labels per association.
    *
    * `scaledRank=false`: global relevance rank via a partition-less
    * `Window.orderBy` — justified only while the entity table is
    * dimension-sized (one row per part), same reasoning as the
    * reference's global study window (Search.scala:600-605).
    * `scaledRank=true`: the same rank through the distributed two-pass
    * `operators.GlobalRank.rowNumber` (range-partition + zipWithIndex)
    * — the catalog-scale cutover for when parts outgrow one task
    * (~20M at sf100). The sort key (totdec desc, l_partkey asc) is
    * unique, so row_number == rank and both variants hash-match the
    * same oracle; that equality IS the cutover's correctness proof.
    * The cutover point itself is measured by tools.CascadeScale on
    * this tail shape at entity scale: 10M rows 10.8 s (GlobalRank) vs
    * 17.4 s (window); 30M rows 24.2 s vs 144.9 s once the single
    * task's sort spills — checksum-equal outputs at both scales.
    */
  private def searchCascade(s: SparkSession, dir: String, scaledRank: Boolean): DataFrame = {
    val orders = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val li = Tables(s, dir, "lineitem")
    val nat = broadcast(Tables(s, dir, "nation").select(col("n_nationkey"), col("n_name")))
    // LUT 1 (diseases analogue): per-customer label array
    val custLut = Tables(s, dir, "customer")
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), array(col("c_mktsegment"), col("n_name")).as("cust_labels"))
    // LUT 2 (drugsByTarget analogue): the reference materializes
    // drugsByTarget as a separate aggregate and left-joins it back
    // (Search.scala:106-124); the supplier side here is a broadcast
    // dim, so the same labels fold into the association aggregate in
    // ONE fact pass — one scan and one shuffle fewer, with the
    // structural mirror preserved in the tier cascade below.
    // (supp_labels is never null this way; the reference's left-outer
    // nullability is exercised by q_entity_merge.)
    val assoc = li
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("l_partkey"), col("o_custkey"))
      .agg(
        sum(graft.functions.ColumnKit.revenueTerm(col("l_extendedprice"), col("l_discount"))).as("revdec"),
        sort_array(collect_set(col("n_name"))).as("supp_labels")
      )
    val w = Window.partitionBy(col("l_partkey")).orderBy(col("revdec").desc, col("o_custkey").asc)
    val ranked = assoc
      .withColumn("rank", rank().over(w))
      .where(col("rank") <= 50)
      .join(custLut, col("o_custkey") === col("c_custkey"))
    def tier(c: Column, r: Int): Column =
      array_join(sort_array(array_distinct(flatten(collect_list(when(col("rank") <= r, c))))), ",")
    val agged = ranked
      .groupBy(col("l_partkey"))
      .agg(
        tier(col("cust_labels"), 50).as("cust_labels_50"),
        tier(col("cust_labels"), 25).as("cust_labels_25"),
        tier(col("cust_labels"), 5).as("cust_labels_5"),
        tier(col("supp_labels"), 50).as("supp_labels_50"),
        tier(col("supp_labels"), 25).as("supp_labels_25"),
        tier(col("supp_labels"), 5).as("supp_labels_5"),
        count(lit(1)).as("n_assoc"),
        sum(col("revdec")).as("totdec")
      )
    // Materialize the part-level aggregate ONCE, BEFORE the global
    // rank: eager localCheckpoint truncates lineage — the reference
    // pins with persist around its fold (Search.scala:652-787), but a
    // persist inside a query leaks unless the caller unpersists;
    // checkpoint blocks are released with the RDD, so Verify/
    // correctness runs need no external cache clearing. Placement
    // matters at both correctness-of-cost levels (r16, closing the r15
    // `weak` item): checkpointing AFTER the rank let GlobalRank's
    // range-partitioner SAMPLING job re-execute the whole cascade
    // reduce side (fact joins + rank window + 6-tier aggregate — the
    // most JIT-expensive code in the registry: ~56 s of compiler CPU
    // on first execution, tools/CascadeProfile), so the query ran the
    // monster stage 2-3x and its cpu swung 45-219 s with JIT timing.
    // Checkpointing the ~20k-row aggregate FIRST makes the sampling
    // pass, the range shuffle, the max-rank fold, and the final
    // projection all read cached rows: the cascade executes exactly
    // once, every run.
    val agg0 = agged.localCheckpoint()
    val g = (if (scaledRank)
               graft.operators.GlobalRank.rowNumber(
                 agg0, Seq(col("totdec").desc, col("l_partkey").asc), "grank")
             else
               agg0.withColumn("grank",
                 rank().over(Window.orderBy(col("totdec").desc, col("l_partkey").asc)))
            ).localCheckpoint()
    // The reference's driver scalar fold: max rank -> multiplier
    // literal (Search.scala:605-606). O(1) result. grank is Int from
    // the window path, Long from GlobalRank — fold through Number.
    val maxRow = g.agg(max(col("grank"))).first()
    // null max = zero surviving entities: any multiplier works on an
    // empty frame; 1 routes through the singleton guard below
    val maxRank = if (maxRow.isNullAt(0)) 1L else maxRow.getAs[Number](0).longValue()
    // Singleton guard: with one surviving entity the reference formula
    // 1 + (max-rank)/(max-1) is 0/0; the limit as max -> 1+ gives the
    // top rank 2.0, so pin that (the oracle's CASE mirrors it) instead
    // of letting NaN flow into the cast.
    val mult =
      if (maxRank == 1L) lit(2.0)
      else lit(1.0) +
        (lit(maxRank) - col("grank")).cast(DoubleType) / lit((maxRank - 1).toDouble)
    g.select(
        col("l_partkey"),
        col("cust_labels_50"), col("cust_labels_25"), col("cust_labels_5"),
        col("supp_labels_50"), col("supp_labels_25"), col("supp_labels_5"),
        col("n_assoc"),
        // multiplier in micro-units: (max-grank)/(max-1) is an exact
        // rational, so round6 would risk the exact-half trap (see
        // ColumnKit determinism recipe); floor(x*1e6) is a pure
        // function of the bit-identical double
        floor(mult * 1e6).cast("long").as("multiplier_micros")
      )
      .orderBy("l_partkey")
  }

  private val cascadeOracleSql: String = s"""WITH assoc AS (
          -- the revenue cell resolves supplier AND nation exactly like
          -- the Spark side's single fact pass: a duplicated supplier id
          -- duplicates its lines' revenue on both engines (chaos-gate
          -- divergence class), and a supplier without a nation
          -- contributes no cell
          SELECT l_partkey, o_custkey, SUM($revTerm) AS revdec
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
          GROUP BY 1, 2),
        supp AS (
          SELECT l_partkey, o_custkey,
                 list_sort(list_distinct(list(n_name))) AS supp_labels
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
          GROUP BY 1, 2),
        ranked AS (
          SELECT a.l_partkey, a.o_custkey, a.revdec, supp.supp_labels,
                 RANK() OVER (PARTITION BY a.l_partkey
                              ORDER BY a.revdec DESC, a.o_custkey) AS rank
          FROM assoc a LEFT JOIN supp
            ON a.l_partkey = supp.l_partkey AND a.o_custkey = supp.o_custkey),
        withcust AS (
          SELECT r.*, [c_mktsegment, n_name] AS cust_labels
          FROM ranked r JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
          WHERE rank <= 50),
        lab AS (
          SELECT l_partkey, rank, unnest(cust_labels) AS lab, 'cust' AS kind FROM withcust
          UNION ALL
          SELECT l_partkey, rank, unnest(supp_labels) AS lab, 'supp' AS kind FROM withcust),
        tiers AS (
          SELECT l_partkey,
            STRING_AGG(DISTINCT CASE WHEN kind = 'cust' THEN lab END, ','
              ORDER BY CASE WHEN kind = 'cust' THEN lab END) AS cust_labels_50,
            STRING_AGG(DISTINCT CASE WHEN kind = 'cust' AND rank <= 25 THEN lab END, ','
              ORDER BY CASE WHEN kind = 'cust' AND rank <= 25 THEN lab END) AS cust_labels_25,
            STRING_AGG(DISTINCT CASE WHEN kind = 'cust' AND rank <= 5 THEN lab END, ','
              ORDER BY CASE WHEN kind = 'cust' AND rank <= 5 THEN lab END) AS cust_labels_5,
            STRING_AGG(DISTINCT CASE WHEN kind = 'supp' THEN lab END, ','
              ORDER BY CASE WHEN kind = 'supp' THEN lab END) AS supp_labels_50,
            STRING_AGG(DISTINCT CASE WHEN kind = 'supp' AND rank <= 25 THEN lab END, ','
              ORDER BY CASE WHEN kind = 'supp' AND rank <= 25 THEN lab END) AS supp_labels_25,
            STRING_AGG(DISTINCT CASE WHEN kind = 'supp' AND rank <= 5 THEN lab END, ','
              ORDER BY CASE WHEN kind = 'supp' AND rank <= 5 THEN lab END) AS supp_labels_5
          FROM lab GROUP BY 1),
        base AS (
          SELECT l_partkey, COUNT(*) AS n_assoc, SUM(revdec) AS totdec
          FROM withcust GROUP BY 1),
        g AS (
          SELECT b.l_partkey, t.cust_labels_50, t.cust_labels_25, t.cust_labels_5,
                 t.supp_labels_50, t.supp_labels_25, t.supp_labels_5, b.n_assoc,
                 RANK() OVER (ORDER BY b.totdec DESC, b.l_partkey) AS grank
          FROM base b JOIN tiers t USING (l_partkey)),
        mx AS (SELECT MAX(grank) AS mr FROM g)
        SELECT l_partkey, cust_labels_50, cust_labels_25, cust_labels_5,
               supp_labels_50, supp_labels_25, supp_labels_5, n_assoc,
               CAST(FLOOR(CASE WHEN mr = 1 THEN 2.0
                               ELSE 1 + (mr - grank) / CAST(mr - 1 AS DOUBLE) END
                          * 1000000) AS BIGINT) AS multiplier_micros
        FROM g, mx ORDER BY l_partkey"""

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    QueryDef(
      "q_search_entity_index",
      (s, dir) => {
        // Search-index skeleton: entity = part; related entities = its
        // top-3 customers by exact-decimal revenue (rank filter applied
        // *inside* the collect, the reference's slice-free top-k idiom,
        // Search.scala:131-139); relevance = log1p(total)+1
        // (Search.scala:290). Two shuffles: (part, cust) aggregate,
        // then per-part window + final aggregate share the part key.
        val rc = Tables(s, dir, "lineitem")
          .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_partkey"), col("o_custkey"))
          .agg(sum(graft.functions.ColumnKit.revenueTerm(col("l_extendedprice"), col("l_discount"))).as("revdec"))
        val w = Window.partitionBy(col("l_partkey")).orderBy(col("revdec").desc, col("o_custkey").asc)
        rc.withColumn("rnk", row_number().over(w))
          .groupBy(col("l_partkey"))
          .agg(
            sum(col("revdec")).cast(D38_2).cast(DoubleType).as("total_rev"),
            count(lit(1)).as("n_cust"),
            array_join(
              transform(
                sort_array(collect_list(when(col("rnk") <= 3, struct(col("rnk"), col("o_custkey"))))),
                x => x.getField("o_custkey").cast("string")
              ),
              ","
            ).as("top_customers")
          )
          .select(
            col("l_partkey"),
            col("total_rev"),
            col("n_cust"),
            col("top_customers"),
            round(log1p(col("total_rev")) + 1, 6).as("relevance")
          )
          .orderBy("l_partkey")
      },
      Some(s"""WITH rc AS (
          SELECT l_partkey, o_custkey, SUM($revTerm) AS revdec
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2),
        rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey
                 ORDER BY revdec DESC, o_custkey) AS rnk FROM rc)
        SELECT l_partkey,
          CAST(ROUND(SUM(revdec), 2) AS DOUBLE) AS total_rev,
          COUNT(*) AS n_cust,
          STRING_AGG(CASE WHEN rnk <= 3 THEN CAST(o_custkey AS VARCHAR) END, ','
                     ORDER BY rnk) AS top_customers,
          ROUND(LN(1 + CAST(ROUND(SUM(revdec), 2) AS DOUBLE)) + 1, 6) AS relevance
        FROM rk GROUP BY 1 ORDER BY 1""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_search_index_cascade",
      (s, dir) => searchCascade(s, dir, scaledRank = false),
      Some(cascadeOracleSql)
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_search_index_cascade_scaled",
      // Same cascade, same oracle, but the global relevance rank runs
      // through the distributed two-pass global row-number
      // (operators.GlobalRank) instead of a partition-less window —
      // the catalog-scale shape for when the entity table outgrows
      // "dimension-sized" (~20M parts at sf100). Both variants being
      // hash-identical under the driver gate IS the cutover's
      // correctness proof.
      (s, dir) => searchCascade(s, dir, scaledRank = true),
      Some(cascadeOracleSql)
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_expression_profile",
      (s, dir) => {
        // Expression-step composite (reference backend/Expression.scala:
        // 15-55 transformNormalTissue + 200-254 tissue/protein
        // assembly): literal-map lookups as functions (reliability ->
        // bool, level -> label), a tissue-level aggregate nesting an
        // `rna` struct and a `protein` struct with collected cell-type
        // structs, then the gene-level collect of full tissue structs.
        // Analogue: gene=part, tissue=nation (via supplier), cell
        // line=supplier. The output EXPLODES the assembled nested
        // document back to flat leaves (getField chains) so the
        // struct-building round trip is exercised end-to-end while the
        // oracle stays flat-typed.
        val levelLabel = typedLit(Map(0 -> "Not detected", 1 -> "Low", 2 -> "Medium", 3 -> "High"))
        val reliabilityOf = typedLit(Map("A" -> false, "N" -> true, "R" -> true))
        val D18_4 = DecimalType(18, 4)
        val base = Tables(s, dir, "lineitem")
          .join(
            broadcast(Tables(s, dir, "supplier")
              .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey")
          )
          .join(
            broadcast(Tables(s, dir, "nation").select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey")
          )
        val cells = base
          .groupBy(col("l_partkey"), col("n_name"))
          .agg(
            sum(col("l_quantity").cast(D18_4)).as("qty_dec"),
            max(col("l_returnflag")).as("max_flag"),
            sort_array(collect_set(struct(col("s_name").as("name")))).as("cell_type")
          )
        // Nation means as a 25-row aggregate broadcast back — NOT a
        // window PARTITION BY n_name over the fact-scale cells table,
        // which would funnel it into |nations| tasks. Computed from
        // the pre-collect base (decimal addition is associative, so
        // sum-over-cells == sum-over-rows EXACTLY; cell count =
        // distinct part per nation) — a narrow second pass with no
        // array baggage, then one double division (the decAvg recipe).
        val nationMeans = base
          .groupBy(col("n_name"))
          .agg(
            (sum(col("l_quantity").cast(D18_4)).cast(D38_2).cast(DoubleType) /
              countDistinct(col("l_partkey"))).as("nation_mean"))
        val tissue = cells
          .withColumn("qty", col("qty_dec").cast(D38_2).cast(DoubleType))
          .join(broadcast(nationMeans), "n_name")
          .withColumn(
            "level",
            when(col("qty") < 25, lit(0)).when(col("qty") < 50, lit(1))
              .when(col("qty") < 100, lit(2)).otherwise(lit(3))
          )
          .select(
            col("l_partkey"),
            struct(
              col("n_name").as("label"),
              struct(
                col("qty").as("value"),
                floor((col("qty") - col("nation_mean")) * 1e6).cast("long").as("zscore_micros"),
                col("level").as("level"),
                levelLabel(col("level")).as("level_label"),
                lit("qty").as("unit")
              ).as("rna"),
              struct(
                reliabilityOf(col("max_flag")).as("reliability"),
                col("cell_type").as("cell_type")
              ).as("protein")
            ).as("tissue")
          )
        val gene = tissue
          .groupBy(col("l_partkey"))
          .agg(sort_array(collect_set(col("tissue"))).as("tissues"))
        // round-trip: explode the nested document, read every leaf back
        gene
          .select(col("l_partkey"), explode(col("tissues")).as("t"))
          .select(
            col("l_partkey"),
            col("t.label").as("tissue_label"),
            col("t.rna.value").as("qty"),
            col("t.rna.zscore_micros").as("zscore_micros"),
            col("t.rna.level").as("level"),
            col("t.rna.level_label").as("level_label"),
            col("t.protein.reliability").as("reliability"),
            size(col("t.protein.cell_type")).as("n_cell_types"),
            col("t.protein.cell_type").getItem(0).getField("name").as("top_cell")
          )
          .orderBy("l_partkey", "tissue_label")
      },
      Some("""WITH cells AS (
          SELECT l_partkey, n_name,
                 SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty_dec,
                 MAX(l_returnflag) AS max_flag,
                 COUNT(DISTINCT s_name) AS n_cell_types,
                 MIN(s_name) AS top_cell
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          GROUP BY 1, 2),
        t AS (
          SELECT l_partkey, n_name,
                 CAST(ROUND(qty_dec, 2) AS DOUBLE) AS qty,
                 CAST(ROUND(SUM(qty_dec) OVER (PARTITION BY n_name), 2) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY n_name) AS nation_mean,
                 max_flag, n_cell_types, top_cell
          FROM cells),
        lv AS (
          SELECT *, CASE WHEN qty < 25 THEN 0 WHEN qty < 50 THEN 1
                         WHEN qty < 100 THEN 2 ELSE 3 END AS level
          FROM t)
        SELECT l_partkey, n_name AS tissue_label, qty,
               CAST(FLOOR((qty - nation_mean) * 1000000) AS BIGINT) AS zscore_micros,
               level,
               CASE level WHEN 0 THEN 'Not detected' WHEN 1 THEN 'Low'
                          WHEN 2 THEN 'Medium' ELSE 'High' END AS level_label,
               CASE max_flag WHEN 'A' THEN FALSE WHEN 'N' THEN TRUE ELSE TRUE END
                 AS reliability,
               CAST(n_cell_types AS INTEGER) AS n_cell_types,
               top_cell
        FROM lv ORDER BY l_partkey, tissue_label""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_text_grounding",
      (s, dir) => {
        // Grounding-lite: normalize tokens (lower + accent fold +
        // stopword removal), build the entity LUT from high-frequency
        // tokens of English documents (a deterministic stand-in for the
        // reference's disease/target LUTs), broadcast-join mentions,
        // disambiguate per doc with a rank over (mentions desc, entity
        // asc) — the dense_rank argmax pattern of
        // literature/Grounding.scala:187-194.
        val stopLit = typedLit(Seq("the", "a", "of", "and", "to", "in", "is"))
        // accent fold + the reference's greek->latin normalise
        // (literature/Grounding.scala:148-150)
        val toks = filter(
          split(translate(lower(col("text")),
            "\u00e1\u00e9\u00ed\u00f3\u00fa\u03b1\u03b2\u03b3\u03b4\u03b5\u03b6\u03b7\u03b9\u03ba\u03bb\u03bc\u03bd\u03be\u03c0\u03c4\u03c5\u03c9",
            "aeiouabgdezhiklmnxptuo"), "\\s+"),
          t => t =!= "" && !array_contains(stopLit, t)
        )
        val ex = Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), explode(toks).as("tok"))
          // eager localCheckpoint, not persist: read by both the LUT
          // build and the mention join; an in-query persist leaks
          // CacheManager entries (PlanAuditSpec guards the registry)
          .localCheckpoint()
        val lut = ex
          .filter(col("lang") === "en")
          .groupBy(col("tok"))
          .agg(count(lit(1)).as("freq"))
          .filter(col("freq") >= 100)
          .select(col("tok").as("entity"))
        val mentions = ex
          .join(broadcast(lut), col("tok") === col("entity"))
          .groupBy(col("doc_id"), col("entity"))
          .agg(count(lit(1)).as("n_mentions"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("n_mentions").desc, col("entity").asc)
        mentions
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") === 1)
          .select(col("doc_id"), col("entity").as("best_entity"), col("n_mentions"))
          .orderBy("doc_id")
      },
      Some("""WITH ex AS (
          SELECT doc_id, lang,
            unnest(list_filter(string_split_regex(translate(lower(text), 'áéíóúαβγδεζηικλμνξπτυω', 'aeiouabgdezhiklmnxptuo'), '\s+'),
              t -> t != '' AND NOT list_contains(['the','a','of','and','to','in','is'], t))) AS tok
          FROM documents),
        lut AS (SELECT tok AS entity FROM ex WHERE lang = 'en'
                GROUP BY 1 HAVING COUNT(*) >= 100),
        m AS (SELECT doc_id, entity, COUNT(*) AS n_mentions
              FROM ex JOIN lut ON tok = entity GROUP BY 1, 2),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY n_mentions DESC, entity) AS rnk FROM m)
        SELECT doc_id, entity AS best_entity, n_mentions
        FROM r WHERE rnk = 1 ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_text_grounding_stemmed",
      (s, dir) => {
        // The FULL grounding chain of the reference — normalize
        // (lower + accent fold + greek->latin) -> Porter STEM ->
        // ground against the LUT -> disambiguate (literature/
        // Grounding.scala:41-104,148-150; the stemmer is the Spark-NLP
        // Stemmer stage replaced by graft.functions.Stemmer). Porter
        // stemming is not expressible in ANSI SQL as an algorithm, but
        // the corpus vocabulary is fixed, so the oracle replays the
        // chain through a (token -> stem) LUT generated from the same
        // Scala stemmer (OracleSql.stemmedGroundingSql); the stemmer
        // algorithm itself is covered by its ScalaTest vectors.
        import graft.functions.Stemmer
        val stopLit = typedLit(Seq("the", "a", "of", "and", "to", "in", "is"))
        val toks = filter(
          split(translate(lower(col("text")),
            "áéíóúαβγδεζηικλμνξπτυω",
            "aeiouabgdezhiklmnxptuo"), "\\s+"),
          t => t =!= "" && !array_contains(stopLit, t)
        )
        val ex = Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), explode(toks).as("tok"))
          .select(col("doc_id"), col("lang"), Stemmer.stemCol(col("tok")).as("stem"))
          // same hygiene as q_text_grounding above
          .localCheckpoint()
        val lut = ex
          .filter(col("lang") === "en")
          .groupBy(col("stem"))
          .agg(count(lit(1)).as("freq"))
          .filter(col("freq") >= 100)
          .select(col("stem").as("entity"))
        val mentions = ex
          .join(broadcast(lut), col("stem") === col("entity"))
          .groupBy(col("doc_id"), col("entity"))
          .agg(count(lit(1)).as("n_mentions"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("n_mentions").desc, col("entity").asc)
        mentions
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") === 1)
          .select(col("doc_id"), col("entity").as("best_entity"), col("n_mentions"))
          .orderBy("doc_id")
      },
      Some(OracleSql.stemmedGroundingSql)
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_entity_merge",
      (s, dir) => {
        // Target-entity merge shape (reference target/Target.scala:
        // 106-170): per-source normalization modules feeding a
        // left-outer enrichment chain, null-safe alias union
        // (safeArrayUnion, Helpers.scala:346-347), and the
        // priority-dedup id cleanup (cleanProteinIds,
        // Target.scala:565-593) re-expressed as array expressions.
        // Entity = part; sources = lineitem stats, rich-supplier LUT,
        // order years.
        import graft.functions.ColumnKit
        import graft.plans.GraftExtensions
        val base = Tables(s, dir, "part")
          .select(col("p_partkey"), col("p_name"), col("p_brand"))
        // All per-source stats in ONE pass over the fact table:
        // orders joined on the shuffle key, supplier broadcast (dim),
        // then a single groupBy with conditional collects — instead of
        // three lineitem scans + three left joins. The id sources are
        // collected ALREADY TAGGED with their priority (rich suppliers
        // win, priority 1, over merely-seen suppliers, priority 2) so
        // the per-row cleanup below is one expression, not a
        // build-union-sort-dedup chain.
        val enriched = Tables(s, dir, "lineitem")
          .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(
            broadcast(Tables(s, dir, "supplier").select(col("s_suppkey"), col("s_acctbal"))),
            col("l_suppkey") === col("s_suppkey")
          )
          .groupBy(col("l_partkey"))
          .agg(
            count(lit(1)).as("n_lines"),
            // No sort_array: priority_dedup_ids canonicalizes (dedup +
            // (priority, id) order), so collect_set's nondeterministic
            // order never reaches the output.
            collect_set(
              struct(
                when(col("s_acctbal") > 5000, lit(1)).otherwise(lit(2)).as("priority"),
                concat(lit("s"), col("l_suppkey")).as("id")
              )
            ).as("supp_tagged"),
            sort_array(collect_set(year(col("o_orderdate")))).as("yrs")
          )
        base
          .join(enriched, col("p_partkey") === col("l_partkey"), "left_outer")
          .select(
            col("p_partkey"),
            coalesce(col("n_lines"), lit(0L)).as("n_lines"),
            // alias kit: name words ∪ brand token, null-safe
            array_join(
              sort_array(ColumnKit.safeArrayUnion(split(col("p_name"), " "), array(lower(col("p_brand"))))),
              ","
            ).as("aliases"),
            // id kit: native codegen'd dedup (best priority per id,
            // (priority, id)-ordered) — replaces the interpreted
            // HOF chain (ColumnKit.priorityDedup, kept as the
            // portable rung), which cost ~5s over 20k rows at sf0.1.
            coalesce(
              array_join(GraftExtensions.priorityDedupIds(col("supp_tagged")), ","),
              lit("")
            ).as("supplier_ids"),
            coalesce(array_join(transform(col("yrs"), y => y.cast("string")), ","), lit(""))
              .as("active_years")
          )
          .orderBy("p_partkey")
      },
      Some("""WITH li AS (SELECT l_partkey, COUNT(*) AS n_lines
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                              JOIN supplier ON l_suppkey = s_suppkey GROUP BY 1),
        -- n_lines counts FULLY-RESOLVED enrichment facts — the Spark
        -- side is ONE pass through lineitem x orders x supplier, so a
        -- duplicated order OR supplier id duplicates its lines on both
        -- engines (chaos fixture carries both)
        yrs AS (SELECT l_partkey, list_sort(list(DISTINCT YEAR(o_orderdate))) AS ys
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1),
        tags AS (
          SELECT l_partkey AS pk, 1 AS pr, 's' || CAST(s_suppkey AS VARCHAR) AS sid
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          WHERE s_acctbal > 5000 GROUP BY 1, 3
          UNION ALL
          SELECT l_partkey, 2, 's' || CAST(l_suppkey AS VARCHAR)
          FROM lineitem GROUP BY 1, 3),
        best AS (SELECT pk, sid, MIN(pr) AS pr FROM tags GROUP BY 1, 2),
        idagg AS (SELECT pk, string_agg(sid, ',' ORDER BY pr, sid) AS supplier_ids
                  FROM best GROUP BY 1)
        SELECT p.p_partkey,
          COALESCE(li.n_lines, 0) AS n_lines,
          -- null-EXACT alias mirror of safeArrayUnion + array_join:
          -- a NULL side becomes [], a NULL element is dropped by the
          -- join, and an all-empty result renders '' (hostile NULL
          -- name/brand rows diverged as NULL under the bare form)
          COALESCE(array_to_string(list_sort(list_filter(list_distinct(
            COALESCE(string_split(p.p_name, ' '), []) ||
            CASE WHEN p.p_brand IS NULL THEN [] ELSE [lower(p.p_brand)] END),
            x -> x IS NOT NULL)), ','), '') AS aliases,
          COALESCE(idagg.supplier_ids, '') AS supplier_ids,
          COALESCE(array_to_string(list_transform(yrs.ys, y -> CAST(y AS VARCHAR)), ','), '') AS active_years
        FROM part p
        LEFT JOIN li ON p.p_partkey = li.l_partkey
        LEFT JOIN idagg ON p.p_partkey = idagg.pk
        LEFT JOIN yrs ON p.p_partkey = yrs.l_partkey
        ORDER BY p.p_partkey""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_array_function_kit",
      (s, dir) => {
        // The remaining §2.8 array surface in one slice: element_at
        // (±index), array_position, array_distinct-based dup check,
        // higher-order filter/exists/forall, slice, array_remove,
        // sequence. Items are collected sorted so every derived value
        // is deterministic.
        // Hostile-row policy (chaos-gate crash class): the all-NULL
        // lineitem row makes a group whose collected array is EMPTY —
        // Spark's collect_list drops NULL elements (DuckDB's list()
        // keeps them: the oracle FILTERs to match), and element_at on
        // an empty array THROWS under ANSI (returns NULL ANSI-off), so
        // every element_at-derived column is size-guarded — NULL on an
        // empty collection in both dialects and both engines. seq_len
        // needs its own guard: Spark's sequence(1, 0) DESCENDS ([1,0])
        // where DuckDB's range(1, 1) is empty.
        val items = col("items")
        val nonEmpty = size(items) > 0
        Tables(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(col("l_partkey"))).as("items"))
          .select(
            col("l_orderkey"),
            size(items).as("n_items"),
            when(nonEmpty, element_at(items, 1)).as("first_item"),
            when(nonEmpty, element_at(items, -1)).as("last_item"),
            when(nonEmpty, array_position(items, element_at(items, -1))).as("pos_of_last"),
            (size(items) =!= size(array_distinct(items))).as("has_dup"),
            size(filter(items, x => x % 2 === 0)).as("n_even"),
            exists(items, x => x > 1900).as("any_gt_1900"),
            forall(items, x => x >= 0).as("all_nonneg"),
            array_join(slice(items, 1, 2), ",").as("first_two"),
            when(nonEmpty,
              array_join(
                transform(array_remove(items, element_at(items, 1)), x => x.cast("string")),
                ","))
              .otherwise(lit("")).as("without_first"),
            when(nonEmpty, size(sequence(lit(1), size(items)))).otherwise(lit(0)).as("seq_len")
          )
          .orderBy("l_orderkey")
      },
      Some("""WITH t AS (SELECT l_orderkey,
                 -- FILTER drops NULL elements (Spark's collect_list
                 -- semantics); COALESCE because an all-NULL group's
                 -- filtered aggregate is NULL where Spark yields []
                 list_sort(COALESCE(list(l_partkey) FILTER (WHERE l_partkey IS NOT NULL),
                                    []::BIGINT[])) AS items
               FROM lineitem GROUP BY 1)
        SELECT l_orderkey,
          CAST(len(items) AS INTEGER) AS n_items,
          items[1] AS first_item,
          items[-1] AS last_item,
          CAST(list_position(items, items[-1]) AS BIGINT) AS pos_of_last,
          len(items) != len(list_distinct(items)) AS has_dup,
          CAST(len(list_filter(items, x -> x % 2 = 0)) AS INTEGER) AS n_even,
          len(list_filter(items, x -> x > 1900)) > 0 AS any_gt_1900,
          len(list_filter(items, x -> x >= 0)) = len(items) AS all_nonneg,
          COALESCE(array_to_string(items[1:2], ','), '') AS first_two,
          COALESCE(array_to_string(list_transform(list_filter(items, x -> x != items[1]),
            x -> CAST(x AS VARCHAR)), ','), '') AS without_first,
          CAST(len(range(1, len(items) + 1)) AS INTEGER) AS seq_len
        FROM t ORDER BY l_orderkey""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_corpus_curation",
      (s, dir) => {
        // The end-to-end training-corpus CURATION FUNNEL — the
        // pipeline a data team actually ships, composed from the
        // already-verified operator families in ONE Spark plan:
        //   0. id canonicalization (latest-wins; reference
        //                          literature/PreProcessing.scala:8-27)
        //   1. exact dedup        (md5 fingerprint, keep the min id)
        //   2. language gate      (marker-argmax prediction must match
        //                          the declared lang — metadata
        //                          consistency, TextQueries.langidPred)
        //   3. quality gate       (the Gopher repetition rule,
        //                          TextQueries.gopherSignals/gopherKeep)
        //   4. mixture sampling   (per-source keep-permille hash rule,
        //                          TextQueries.mixtureHmod)
        // Output: one row per document with its FIRST-failing stage
        // ('dup' < 'lang' < 'quality' < 'mixture' < 'kept') — the
        // funnel report that tells you where the corpus went. Every
        // rule is THE shared definition the standalone queries verify
        // (private[queries] helpers), so the composite can't drift
        // from its parts. Scale shape: one fingerprint-partitioned
        // window (dedup), per-doc map-side expressions (langid,
        // mixture), and the two partial-agg'd counting shuffles
        // (gopher) joined back on doc_id — no global pass, no
        // broadcast of anything data-sized, every stage keyed on
        // doc_id or a hash of content.
        //
        // Stage 0 resolves duplicate doc_ids BEFORE anything else: the
        // funnel's stage joins and report are keyed on doc_id, so one
        // id carrying two different texts would make every downstream
        // join fan-out engine-ambiguous (the r11 chaos divergence).
        // The reference runs exactly this shape on every literature
        // ingest — latest-version-wins keyed dedup
        // (literature/PreProcessing.scala:8-27). Documents carry no
        // timestamp, so the "latest" proxy is the fullest row:
        // greatest n_chars, then md5(text)/lang/source as total,
        // engine-portable tie-breaks (NULLS LAST made explicit — the
        // two engines default differently). One extra window on the
        // same doc_id key the funnel already shuffles on.
        val wId = Window.partitionBy(col("doc_id")).orderBy(
          col("n_chars").desc_nulls_last,
          md5(col("text").cast("binary")).desc_nulls_last,
          col("lang").desc_nulls_last,
          col("source").desc_nulls_last)
        // eager localCheckpoint: the canonicalized table feeds TWO
        // branches (the dedup/langid spine and the gopher-signal
        // aggregate); without materialization each branch re-runs the
        // canon window — measured 2x on the whole query at sf0.1
        val base = Tables(s, dir, "documents")
          .withColumn("__rn", row_number().over(wId))
          .filter(col("__rn") === 1)
          .select(col("doc_id"), col("source"), col("lang"), col("text"),
            TextKit.tokens(col("text")).as("w"))
          .localCheckpoint()
        val wFp = Window.partitionBy(col("fp"))
        val withDup = base
          .withColumn("fp", md5(col("text").cast("binary")))
          .withColumn("is_dup", col("doc_id") =!= min(col("doc_id")).over(wFp))
        val withLang = TextQueries.withLangHits(withDup)
        val Seq(de, en, es, fr, zh) =
          Seq("de", "en", "es", "fr", "zh").map(l => col(s"h_$l"))
        val sig = TextQueries.gopherSignals(base.select(col("doc_id"), col("w")))
        val permilleLut = typedLit(TextQueries.mixturePermille)
        withLang
          .join(sig, "doc_id")
          .withColumn("pred_lang", TextQueries.langidPred(de, en, es, fr, zh))
          .withColumn("hmod", TextQueries.mixtureHmod(col("doc_id")))
          .withColumn(
            "permille",
            coalesce(permilleLut(col("source")), lit(100)))
          .select(
            col("doc_id"), col("source"), col("lang"),
            when(col("is_dup"), "dup")
              .when(col("pred_lang") =!= col("lang"), "lang")
              .when(!TextQueries.gopherKeep, "quality")
              .when(col("hmod") >= col("permille"), "mixture")
              .otherwise("kept")
              .as("stage"))
          .orderBy("doc_id")
      },
      Some(s"""WITH canon AS (SELECT doc_id, text, lang, source, n_chars FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY n_chars DESC NULLS LAST, md5(text) DESC NULLS LAST,
                            lang DESC NULLS LAST, source DESC NULLS LAST) AS rn
                 FROM documents) WHERE rn = 1),
        t AS (SELECT doc_id, source, lang, text,
                 ${TextQueries.wordsSql} AS w FROM canon),
        dd AS (SELECT doc_id,
                 doc_id != MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
               FROM canon),
        ${TextQueries.langHitsCteSql},
        p AS (SELECT doc_id, ${TextQueries.langidPredSql} AS pred_lang FROM h),
        ${TextQueries.gopherSignalsCteSql},
        m AS (SELECT doc_id,
                ${OracleSql.foldSql("CAST(doc_id AS VARCHAR) || '#mix7'", 31)} % 1000 AS hmod,
                ${TextQueries.mixturePermilleSql} AS permille
              FROM canon)
        SELECT t.doc_id, t.source, t.lang,
          CASE WHEN is_dup THEN 'dup'
               WHEN pred_lang != t.lang THEN 'lang'
               WHEN NOT ${TextQueries.gopherKeepSql} THEN 'quality'
               WHEN hmod >= permille THEN 'mixture'
               ELSE 'kept' END AS stage
        FROM t JOIN dd USING (doc_id) JOIN p USING (doc_id)
             JOIN sig USING (doc_id) JOIN m USING (doc_id)
        ORDER BY t.doc_id""")
    )
  )
}
