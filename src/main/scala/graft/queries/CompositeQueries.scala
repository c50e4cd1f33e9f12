package graft.queries

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
        val toks = filter(
          split(translate(lower(col("text")), "áéíóú", "aeiou"), "\\s+"),
          t => t =!= "" && !array_contains(stopLit, t)
        )
        val ex = Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), explode(toks).as("tok"))
          .persist()
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
            unnest(list_filter(string_split_regex(translate(lower(text), 'áéíóú', 'aeiou'), '\s+'),
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
        val base = Tables(s, dir, "part")
          .select(col("p_partkey"), col("p_name"), col("p_brand"))
        // All per-source stats in ONE pass over the fact table:
        // orders joined on the shuffle key, supplier broadcast (dim),
        // then a single groupBy with conditional collects — instead of
        // three lineitem scans + three left joins.
        val enriched = Tables(s, dir, "lineitem")
          .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(
            broadcast(Tables(s, dir, "supplier").select(col("s_suppkey"), col("s_acctbal"))),
            col("l_suppkey") === col("s_suppkey")
          )
          .groupBy(col("l_partkey"))
          .agg(
            count(lit(1)).as("n_lines"),
            sort_array(collect_set(col("l_suppkey"))).as("supp_seen"),
            sort_array(collect_set(when(col("s_acctbal") > 5000, col("s_suppkey"))))
              .as("supp_rich"),
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
            // id kit: rich suppliers win (priority 1) over merely-seen
            // suppliers (priority 2)
            coalesce(
              array_join(
                ColumnKit.priorityDedup(
                  ColumnKit.safeArrayUnion(
                    transform(col("supp_rich"), x => struct(lit(1).as("priority"), concat(lit("s"), x).as("id"))),
                    transform(col("supp_seen"), x => struct(lit(2).as("priority"), concat(lit("s"), x).as("id")))
                  )
                ),
                ","
              ),
              lit("")
            ).as("supplier_ids"),
            coalesce(array_join(transform(col("yrs"), y => y.cast("string")), ","), lit(""))
              .as("active_years")
          )
          .orderBy("p_partkey")
      },
      Some("""WITH li AS (SELECT l_partkey, COUNT(*) AS n_lines FROM lineitem GROUP BY 1),
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
          array_to_string(list_sort(list_distinct(
            string_split(p.p_name, ' ') || [lower(p.p_brand)])), ',') AS aliases,
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
        Tables(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(col("l_partkey"))).as("items"))
          .select(
            col("l_orderkey"),
            size(col("items")).as("n_items"),
            element_at(col("items"), 1).as("first_item"),
            element_at(col("items"), -1).as("last_item"),
            array_position(col("items"), element_at(col("items"), -1)).as("pos_of_last"),
            (size(col("items")) =!= size(array_distinct(col("items")))).as("has_dup"),
            size(filter(col("items"), x => x % 2 === 0)).as("n_even"),
            exists(col("items"), x => x > 1900).as("any_gt_1900"),
            forall(col("items"), x => x >= 0).as("all_nonneg"),
            array_join(slice(col("items"), 1, 2), ",").as("first_two"),
            array_join(
              transform(array_remove(col("items"), element_at(col("items"), 1)), x => x.cast("string")),
              ","
            ).as("without_first"),
            size(sequence(lit(1), size(col("items")))).as("seq_len")
          )
          .orderBy("l_orderkey")
      },
      Some("""WITH t AS (SELECT l_orderkey, list_sort(list(l_partkey)) AS items
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
          array_to_string(items[1:2], ',') AS first_two,
          COALESCE(array_to_string(list_transform(list_filter(items, x -> x != items[1]),
            x -> CAST(x AS VARCHAR)), ','), '') AS without_first,
          CAST(len(range(1, len(items) + 1)) AS INTEGER) AS seq_len
        FROM t ORDER BY l_orderkey""")
    )
  )
}
