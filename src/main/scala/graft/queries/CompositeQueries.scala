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
          len(items) AS n_items,
          items[1] AS first_item,
          items[-1] AS last_item,
          list_position(items, items[-1]) AS pos_of_last,
          len(items) != len(list_distinct(items)) AS has_dup,
          len(list_filter(items, x -> x % 2 = 0)) AS n_even,
          len(list_filter(items, x -> x > 1900)) > 0 AS any_gt_1900,
          len(list_filter(items, x -> x >= 0)) = len(items) AS all_nonneg,
          array_to_string(items[1:2], ',') AS first_two,
          COALESCE(array_to_string(list_transform(list_filter(items, x -> x != items[1]),
            x -> CAST(x AS VARCHAR)), ','), '') AS without_first,
          len(range(1, len(items) + 1)) AS seq_len
        FROM t ORDER BY l_orderkey""")
    )
  )
}
