package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.TextKit

/** Text-analysis + deduplication operators over the `documents` table
  * — the LLM-data-pipeline surface (builder brief): quality stats,
  * language ID, fingerprinting, exact dedup, n-gram Jaccard near-dup,
  * MinHash+LSH near-dup, SimHash. All pure column expressions
  * (codegen'd higher-order functions, no UDFs), each mirrored in
  * DuckDB SQL for the oracle.
  *
  * Scale notes (100 TB posture):
  *  - per-document stats are embarrassingly parallel projections;
  *  - the Jaccard shingle self-join is the candidate-generation
  *    pattern (join on shared shingle, group by pair) — at scale add a
  *    document-frequency stop-list on shingles to bound fanout;
  *  - MinHash+LSH replaces the quadratic shingle join with
  *    O(docs x bands) bucket joins — the scale path for near-dedup;
  *  - SimHash gives a per-doc 62-bit sketch; banding its bit-slices
  *    yields hamming-distance candidates the same way.
  */
object TextQueries {

  private val P = TextKit.HashP

  /** DuckDB mirror of TextKit.charHash (shared — OracleSql.foldSql). */
  private def foldSql(e: String, mult: Int): String = OracleSql.foldSql(e, mult)

  /** DuckDB mirror of TextKit.tokens (shared with the curation
    * composite's oracle).
    */
  private[queries] val wordsSql = "list_filter(string_split(lower(text), ' '), x -> x != '')"

  /** q_quality_lm_perplexity keep threshold: documents at or below this
    * bigram-LM perplexity pass the filter. Tuned to split this corpus
    * (measured ppl spans ~26-37 with median ~29.6 at sf0.001 AND
    * sf0.01; 30.0 keeps the ~70% low-perplexity head — the CCNet
    * head/middle cut); a real pipeline calibrates against a held-out
    * target-domain sample (CCNet uses a Wikipedia-trained LM).
    */
  private val LmPerplexityKeepMax = 30.0

  /** q_corpus_dsir feature-hash bucket count (the paper's fixed hash
    * width): interpolated into BOTH the Spark plan and the oracle SQL
    * so the two cannot drift.
    */
  private val DsirBuckets = 1024

  /** DuckDB mirror of TextKit.shingles(_, 3). */
  private val shinglesSql =
    "list_distinct(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))"

  private val stop = Seq("the", "a", "of", "and", "to", "in", "is")
  private val stopSqlList = stop.map(s => s"'$s'").mkString("[", ", ", "]")

  /** BPE training vocabulary: the fixed corpus vocabulary INCLUDING
    * stopwords (the grounding LUT excludes them, but the tokenizer
    * sees them) — so the oracle LUT covers every corpus token and the
    * OOV fallback only fires on a genuinely stale vocabulary.
    */
  private lazy val bpeVocab: Seq[String] =
    (OracleSql.stemmedGroundingVocab ++ stop).distinct.sorted
  private lazy val bpeMerges: Seq[(String, String)] =
    graft.functions.Bpe.train(bpeVocab.map(_ -> 1L), numMerges = 30)

  /** Language-marker lists + deterministic argmax — shared by
    * q_text_langid and the curation composite (one definition, so the
    * two can't drift).
    */
  private[queries] val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了")
  )

  /** Add the five `h_<lang>` marker-hit columns for token column `w` —
    * one definition shared by q_text_langid, q_quality_classifier, and
    * the curation composite. The counts are NULL-GUARDED so a NULL
    * token array yields NULL hits in BOTH dialects (bare size() is -1
    * under the production ANSI-off session via legacy sizeOfNull, NULL
    * under ANSI — the dual-dialect chaos gate caught the -1 leaking
    * into pred_lang as a spurious 'de' verdict); langidPred then lands
    * in its otherwise-'zh' branch exactly like the oracle's CASE ELSE.
    */
  private[queries] def withLangHits(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    langMarkers.foldLeft(df) { case (d, (l, ms)) =>
      d.withColumn(
        s"h_$l",
        when(col("w").isNotNull,
          size(filter(col("w"), x => array_contains(typedLit(ms), x)))))
    }

  /** Argmax with alphabetical tie-break over the five marker-hit
    * counts (the q_text_langid rule).
    */
  private[queries] def langidPred(
      de: Column, en: Column, es: Column, fr: Column, zh: Column): Column =
    when(de >= en && de >= es && de >= fr && de >= zh, "de")
      .when(en >= es && en >= fr && en >= zh, "en")
      .when(es >= fr && es >= zh, "es")
      .when(fr >= zh, "fr")
      .otherwise("zh")

  /** Per-doc Gopher repetition signals (raw, unrounded — consumers
    * round for display but COMPARE on the exact integer-ratio values):
    * doc_id, n (tokens), mxu (top unigram count), chars (total token
    * chars), nb (bigrams), mxb (top bigram count), dupb (positions in
    * bigrams occurring >1). Input: (doc_id, w) with w the token array.
    */
  private[queries] def gopherSignals(toks: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // NON-distinct bigrams (repetition is the signal — shingles()
    // dedups, which would erase it); guard <2 tokens: sequence()
    // would generate a DESCENDING range instead of an empty one
    val bigrams = when(size(col("w")) < 2, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(col("w")) - 1),
        i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1))))
    val uni = toks.select(col("doc_id"), explode(col("w")).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n"),
        max(col("c")).as("mxu"),
        sum(length(col("t")) * col("c")).as("chars"))
    val bi = toks.select(col("doc_id"), explode(bigrams).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("nb"),
        max(col("c")).as("mxb"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dupb"))
    // ONE ROW PER INPUT DOC: explode drops empty docs from `uni` and
    // <2-token docs from `bi`; inner-joining them would silently drop
    // those documents from every downstream funnel. Left-join back
    // onto the doc list and zero-fill, so a 1-token doc reports
    // (n=1, nb=0) instead of vanishing.
    toks.select(col("doc_id"))
      .join(uni, Seq("doc_id"), "left")
      .join(bi, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n", "mxu", "chars", "nb", "mxb", "dupb"))
  }

  /** The Gopher keep rule over the raw signal columns (thresholds
    * tuned to split this corpus; a real pipeline uses the published
    * constants).
    */
  private[queries] val gopherKeep: Column =
    // n > 0 / nb > 0 guards: with <2 tokens the ratios are x/0 = NULL
    // (ANSI off, same as DuckDB), and FALSE AND NULL = FALSE in both
    // engines — degenerate docs fail the quality gate instead of
    // evaluating to NULL.
    col("n") > 0 && col("nb") > 0 &&
      col("mxu") / col("n") <= 0.10 &&
      col("mxb") / col("nb") <= 0.05 &&
      col("dupb") / col("nb") <= 0.10

  private[queries] val gopherKeepSql: String =
    "(n > 0 AND nb > 0 AND mxu / n <= 0.10 AND mxb / nb <= 0.05 AND dupb / nb <= 0.10)"

  /** DuckDB mirror of [[gopherSignals]]: CTEs `ua(doc_id, n, mxu,
    * chars)` and `ba(doc_id, nb, mxb, dupb)` over `t(doc_id, w)`,
    * re-joined as `sig` (one zero-filled row per doc in `t`, like the
    * Scala side's left-join).
    */
  private[queries] val gopherSignalsCteSql: String =
    s"""u AS (SELECT doc_id, unnest(w) AS t FROM t),
        uc AS (SELECT doc_id, t, COUNT(*) AS c FROM u GROUP BY 1, 2),
        ua AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, CAST(MAX(c) AS BIGINT) AS mxu,
                      CAST(SUM(length(t) * c) AS BIGINT) AS chars
               FROM uc GROUP BY 1),
        b AS (SELECT doc_id,
                unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg
              FROM t),
        bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM b GROUP BY 1, 2),
        ba AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nb, CAST(MAX(c) AS BIGINT) AS mxb,
                      CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dupb
               FROM bc GROUP BY 1),
        sig AS (SELECT t.doc_id,
                  COALESCE(n, 0) AS n, COALESCE(mxu, 0) AS mxu,
                  COALESCE(chars, 0) AS chars, COALESCE(nb, 0) AS nb,
                  COALESCE(mxb, 0) AS mxb, COALESCE(dupb, 0) AS dupb
                FROM t LEFT JOIN ua USING (doc_id) LEFT JOIN ba USING (doc_id))"""

  /** DuckDB mirror of the five marker-hit counts: CTE `h(doc_id,
    * h_de..h_zh)` over `t(doc_id, w, ...)`. GENERATED from
    * [[langMarkers]] (not restated), so editing a marker list cannot
    * drift the oracle from the Spark side.
    */
  /** The per-language hit-count column list alone (row-wise — safe to
    * embed in any projection; consumers that must stay one-row-per-row
    * under DUPLICATE doc_ids use this instead of joining back on
    * [[langHitsCteSql]]'s h CTE).
    */
  private[queries] val langHitsColsSql: String =
    langMarkers.map { case (l, ms) =>
      val lst = ms.map(m => s"'$m'").mkString(",")
      s"len(list_filter(w, x -> list_contains([$lst], x))) AS h_$l"
    }.mkString(",\n          ")

  private[queries] val langHitsCteSql: String =
    s"""h AS (SELECT doc_id,
          $langHitsColsSql
          FROM t)"""

  /** DuckDB mirror of [[langidPred]] over the h CTE columns. */
  private[queries] val langidPredSql: String =
    """CASE
         WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de >= h_zh THEN 'de'
         WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
         WHEN h_es >= h_fr AND h_es >= h_zh THEN 'es'
         WHEN h_fr >= h_zh THEN 'fr'
         ELSE 'zh' END"""

  /** Per-source mixture keep-permille + the portable hash rule —
    * shared by q_corpus_mixture and the curation composite.
    */
  private[queries] val mixturePermille: Map[String, Int] =
    Map("src0" -> 1000, "src1" -> 750, "src2" -> 500, "src3" -> 250)

  private[queries] def mixtureHmod(docId: Column): Column =
    TextKit.charHash(concat(docId.cast("string"), lit("#mix7"))) % 1000

  // GENERATED from mixturePermille (not restated), so editing the
  // mixture rule cannot drift the oracle from the Spark side
  private[queries] val mixturePermilleSql: String =
    mixturePermille.toSeq.sortBy(_._1)
      .map { case (src, pm) => s"WHEN '$src' THEN $pm" }
      .mkString("CASE source ", " ", " ELSE 100 END")

  /** Shared decontamination rule (q_contamination_ngram + _bloom):
    * per-doc DISTINCT 4-gram shingles, eval suite = doc_id % 50 == 0.
    * Returns (ev(s, eval_id), tr(s, train_id)). One definition so the
    * two ladder rungs cannot drift.
    */
  private[queries] def contaminationSides(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    // materialize the token array into a column BEFORE shingling:
    // shingles' per-position lambda references its input once per
    // shingle, so an inlined tokens() EXPRESSION would re-tokenize
    // the whole text per position — O(len^2) per doc (measured
    // 7.6 s -> ~1 s at sf0.1)
    val sh = Tables(s, dir, "documents")
      .select(col("doc_id"), TextKit.tokens(col("text")).as("w"))
      .select(col("doc_id"), explode(TextKit.shingles(col("w"), 4)).as("s"))
    (sh.filter(col("doc_id") % 50 === 0).select(col("s"), col("doc_id").as("eval_id")),
      sh.filter(col("doc_id") % 50 =!= 0).select(col("s"), col("doc_id").as("train_id")))
  }

  /** Shared finish for the contamination rungs: count distinct shared
    * shingles per (train, eval) pair; >= 3 flags contamination.
    */
  private[queries] def contaminationFinish(joined: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = joined
    .groupBy(col("train_id"), col("eval_id"))
    .agg(count(lit(1)).as("n_shared"))
    .select(
      col("train_id"), col("eval_id"), col("n_shared"),
      (col("n_shared") >= 3).as("contaminated"))
    .orderBy("train_id", "eval_id")

  /** The ONE exact oracle both contamination rungs hash against —
    * the sketch-prune rung is lossless (no Bloom false negatives), so
    * it must answer the identical SQL.
    */
  private[queries] val contaminationOracleSql: String =
    s"""WITH t AS (SELECT doc_id, $wordsSql AS w FROM documents),
        sh AS (SELECT doc_id,
                 unnest(list_distinct(list_transform(range(1, len(w) - 2),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))) AS s
               FROM t),
        ev AS (SELECT s, doc_id AS eval_id FROM sh WHERE doc_id % 50 = 0),
        tr AS (SELECT s, doc_id AS train_id FROM sh WHERE doc_id % 50 != 0)
        SELECT train_id, eval_id, COUNT(*) AS n_shared, COUNT(*) >= 3 AS contaminated
        FROM tr JOIN ev USING (s) GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Overlapping token windows per document (window ChunkW tokens,
    * stride ChunkS): the shared front half of q_text_chunking and
    * q_chunk_packing. Chunk count: 1 if n<=W else ceil((n-W)/S)+1, so
    * the final window always starts within the text. Pure column
    * expressions — sequence+explode generates per-doc chunk ids with
    * no driver loop and no shuffle.
    */
  private[graft] val ChunkW = 16
  private[graft] val ChunkS = 12

  /** Chunk count for a token-array column: 1 if n<=W else
    * ceil((n-W)/S)+1. Exposed (package-private) so the boundary spec
    * tests the PRODUCTION expression, not a copy.
    */
  private[graft] def chunkCount(toks: Column): Column =
    // leading NULL guard (dual-dialect chaos class): a NULL token
    // array must yield NULL — no chunks — in BOTH dialects; without it
    // the production ANSI-off session's size(NULL) = -1 satisfies
    // `<= ChunkW` and invents one chunk for a NULL-text document
    // (ANSI and the oracle both produce none)
    when(toks.isNull, lit(null).cast("int"))
      .when(size(toks) <= ChunkW, lit(1))
      .otherwise(ceil((size(toks) - lit(ChunkW)).cast(DoubleType) / ChunkS).cast("int") + 1)

  private def chunkWindows(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val toks = TextKit.tokens(col("text"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), toks.as("toks"))
      .withColumn("nc", chunkCount(col("toks")))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), col("nc") - 1)).as("chunk_id"))
      .select(
        col("doc_id"),
        col("chunk_id"),
        size(slice(col("toks"), col("chunk_id") * ChunkS + 1, lit(ChunkW))).as("n_tokens"),
        array_join(slice(col("toks"), col("chunk_id") * ChunkS + 1, lit(ChunkW)), " ").as("chunk_text")
      )
  }

  /** DuckDB mirror of [[chunkWindows]]: CTE `c(doc_id, toks, chunk_id)`
    * with the slice bounds left to the consumer.
    */
  private val chunkCteSql: String =
    s"""t AS (
          SELECT doc_id, $wordsSql AS toks FROM documents),
        n AS (
          SELECT doc_id, toks,
            CASE WHEN len(toks) <= $ChunkW THEN 1
                 ELSE CAST(CEIL((len(toks) - $ChunkW) / $ChunkS.0) AS INT) + 1 END AS nc
          FROM t),
        c AS (SELECT doc_id, toks, unnest(range(0, nc)) AS chunk_id FROM n)"""

  private val chunkSliceSql = s"toks[chunk_id*$ChunkS+1 : chunk_id*$ChunkS+$ChunkW]"

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    QueryDef(
      "q_text_stats",
      (s, dir) => {
        val w = TextKit.tokens(col("text"))
        val stopLit = typedLit(stop)
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("text"), w.as("w"))
          .select(
            col("doc_id"),
            // NULL-guarded sizes (dual-dialect chaos class): bare
            // size(NULL) is -1 under the production ANSI-off session
            // while the oracle's len(NULL) is NULL
            when(col("w").isNotNull, size(col("w"))).as("n_tokens"),
            when(col("w").isNotNull, size(array_distinct(col("w")))).as("n_unique"),
            when(col("w").isNotNull,
              size(filter(col("w"), x => array_contains(stopLit, x)))).as("n_stop"),
            // BPE-style pre-tokenizer count: letter runs, digit runs,
            // and single punctuation marks (the subword budget a
            // tokenizer would see, before merges)
            regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).as("n_subtokens")
          )
          .select(
            col("doc_id"),
            col("n_tokens"),
            col("n_unique"),
            col("n_subtokens"),
            // zero-token guard (chaos-fixture ANSI crash class): the
            // ratios are NULL for an empty doc — DuckDB's x/0 is NULL
            // naturally, Spark's is Infinity/NaN non-ANSI and a
            // DIVIDE_BY_ZERO throw under ANSI (the Verify/Bench
            // default), so the when() is both the crash fix AND the
            // cross-engine alignment
            when(col("n_tokens") > 0,
              round(col("n_unique") / col("n_tokens"), 6)).as("ttr"),
            when(col("n_tokens") > 0,
              round(col("n_stop") / col("n_tokens"), 6)).as("stop_ratio"),
            when(col("n_tokens") > 0,
              round(
                col("n_unique") / col("n_tokens") * 0.5 +
                  (lit(1.0) - col("n_stop") / col("n_tokens")) * 0.3 +
                  least(lit(1.0), col("n_tokens") / 100.0) * 0.2,
                6)).as("quality")
          )
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, text, $wordsSql AS w FROM documents),
        c AS (SELECT doc_id, len(w) AS n_tokens,
                len(list_distinct(w)) AS n_unique,
                len(list_filter(w, x -> list_contains($stopSqlList, x))) AS n_stop,
                len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_subtokens
              FROM t)
        SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
          CAST(n_unique AS INTEGER) AS n_unique,
          CAST(n_subtokens AS INTEGER) AS n_subtokens,
          ROUND(n_unique / n_tokens, 6) AS ttr,
          ROUND(n_stop / n_tokens, 6) AS stop_ratio,
          ROUND(n_unique / n_tokens * 0.5 + (CAST(1 AS DOUBLE) - n_stop / n_tokens) * 0.3
                + LEAST(CAST(1 AS DOUBLE), n_tokens / CAST(100 AS DOUBLE)) * 0.2, 6) AS quality
        FROM c ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_text_langid",
      (s, dir) => {
        // Stopword-marker language ID: occurrence count per language
        // marker list, argmax with alphabetical tie-break (langMarkers
        // + langidPred — one definition shared with the curation
        // composite, so the two can't drift). A real pipeline swaps
        // the marker lists for char-n-gram profiles; the operator
        // shape (per-doc scoring + deterministic argmax) is identical.
        val w = TextKit.tokens(col("text"))
        val withHits = withLangHits(
          Tables(s, dir, "documents").select(col("doc_id"), w.as("w")))
        val Seq(de, en, es, fr, zh) = Seq("de", "en", "es", "fr", "zh").map(l => col(s"h_$l"))
        withHits
          .select(
            col("doc_id"),
            langidPred(de, en, es, fr, zh).as("pred_lang"),
            greatest(de, en, es, fr, zh).as("n_hits")
          )
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, $wordsSql AS w FROM documents),
        $langHitsCteSql
        SELECT doc_id,
          $langidPredSql AS pred_lang,
          CAST(GREATEST(h_de, h_en, h_es, h_fr, h_zh) AS INTEGER) AS n_hits
        FROM h ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_text_fingerprint",
      (s, dir) => {
        val w = TextKit.tokens(col("text"))
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("text"), w.as("w"))
          .filter(size(col("w")) >= 3)
          // hash each shingle once; min/max read the same array
          .withColumn(
            "shfp",
            transform(TextKit.shinglesKernel(3)(col("w")), sh => TextKit.charHash(sh))
          )
          .select(
            col("doc_id"),
            md5(col("text").cast("binary")).as("md5_fp"),
            TextKit.charHash(col("text")).as("poly_fp"),
            array_min(col("shfp")).as("min_shingle_fp"),
            array_max(col("shfp")).as("max_shingle_fp")
          )
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, text, $wordsSql AS w FROM documents),
        f AS (SELECT doc_id, text, $shinglesSql AS ss FROM t WHERE len(w) >= 3)
        SELECT doc_id, md5(text) AS md5_fp,
          ${foldSql("text", 31)} AS poly_fp,
          list_min(list_transform(ss, s -> ${foldSql("s", 31)})) AS min_shingle_fp,
          list_max(list_transform(ss, s -> ${foldSql("s", 31)})) AS max_shingle_fp
        FROM f ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_dedup_exact",
      (s, dir) => {
        // Exact dedup by content hash (hash-groupBy): every doc mapped
        // to its group's canonical (min) id. One shuffle on the
        // 128-bit content hash — the standard first pass of any
        // training-data dedup stack.
        val wFp = Window.partitionBy(col("fp"))
        Tables(s, dir, "documents")
          .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
          .select(
            col("doc_id"),
            min(col("doc_id")).over(wFp).as("canonical_id"),
            count(lit(1)).over(wFp).as("group_size")
          )
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
          MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
          COUNT(*) OVER (PARTITION BY md5(text)) AS group_size
        FROM documents ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_dedup_jaccard_ngram",
      (s, dir) => {
        // Exact word-3-gram Jaccard near-dup: one codegen'd self-join
        // on the exploded shingle table, shared counts via map-side
        // partial aggregation, sizes carried inline so nothing joins
        // back. One shuffle for the pair aggregate. The exploded table
        // is localCheckpoint'ed so shingling runs once, not once per
        // join side — checkpoint, not persist: an in-query persist
        // leaks CacheManager entries past the query's action
        // (PlanAuditSpec guards this across the registry).
        //
        // Scale ladder (measured here: uniform shingle DF, so the
        // simple join wins): when shingle document-frequency is skewed,
        // add PPJoin prefix filtering (join only each doc's
        // n - ceil(tau*n) + 1 rarest shingles — still exact) or switch
        // to q_dedup_minhash_lsh, the sub-quadratic path.
        val tau = 0.5
        val w = TextKit.tokens(col("text"))
        val ex = Tables(s, dir, "documents")
          .select(col("doc_id"), w.as("w"))
          .filter(size(col("w")) >= 3)
          .select(col("doc_id"), TextKit.shinglesKernel(3)(col("w")).as("ss"))
          .select(col("doc_id"), size(col("ss")).as("n"), explode(col("ss")).as("s"))
          .localCheckpoint()
        ex.as("x")
          .join(
            ex.as("y"),
            col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id") &&
              // PPJoin length filter (lossless): J >= tau forces
              // tau * max(n1,n2) <= min(n1,n2), so size-incompatible
              // pairs are pruned before the pair aggregate
              greatest(col("x.n"), col("y.n")) * tau <= least(col("x.n"), col("y.n"))
          )
          .groupBy(
            col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
            col("x.n").as("n1"), col("y.n").as("n2")
          )
          .agg(count(lit(1)).as("shared"))
          .withColumn("j", col("shared") / (col("n1") + col("n2") - col("shared")))
          .filter(col("j") >= tau)
          // floor-micros, not round6: jaccard is an exact rational and
          // power-of-two denominators land on rounding half-boundaries
          // where Spark (decimal-string) and DuckDB (binary) disagree
          .select(col("d1"), col("d2"), floor(col("j") * 1e6).cast("long").as("jaccard_micros"))
          .orderBy("d1", "d2")
      },
      Some(s"""WITH t AS (SELECT doc_id, $wordsSql AS w FROM documents),
        d AS (SELECT doc_id, $shinglesSql AS ss FROM t WHERE len(w) >= 3),
        ex AS (SELECT doc_id, unnest(ss) AS s FROM d),
        n AS (SELECT doc_id, len(ss) AS n FROM d),
        shared AS (SELECT x.doc_id AS d1, y.doc_id AS d2, COUNT(*) AS shared
          FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2)
        SELECT d1, d2,
          CAST(FLOOR(shared / (n1.n + n2.n - shared) * 1000000) AS BIGINT) AS jaccard_micros
        FROM shared JOIN n n1 ON d1 = n1.doc_id JOIN n n2 ON d2 = n2.doc_id
        WHERE shared / (n1.n + n2.n - shared) >= 0.5
        ORDER BY d1, d2""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_dedup_jaccard_ppjoin",
      (s, dir) => {
        // PPJoin-style prefix-filtered exact Jaccard (the middle rung
        // of the dedup ladder, between the plain shingle join and
        // MinHash+LSH): under a global shingle order (ascending
        // document frequency, rarest first), any pair with J >= tau
        // must share its smallest common shingle inside BOTH prefixes
        // of length n - ceil(tau*n) + 1 — so joining only prefixes is
        // LOSSLESS, and the join fanout is driven by rare shingles
        // instead of the hottest shared shingle. Candidates are then
        // verified exactly with the native codegen'd sorted-merge
        // intersect, so the oracle is the same exact-Jaccard SQL as
        // q_dedup_jaccard_ngram. (Bayardo et al., WWW'07 all-pairs;
        // prefix filter per Chaudhuri et al., ICDE'06.)
        val tau = 0.5
        val w = TextKit.tokens(col("text"))
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id"), w.as("w"))
          .filter(size(col("w")) >= 3)
          .select(col("doc_id"), TextKit.shinglesKernel(3)(col("w")).as("ss"))
          // eager localCheckpoint, not persist: read by both the
          // prefix build and the verify join, and persist would leak
          // CacheManager entries past the query (PlanAuditSpec guard)
          .localCheckpoint()
        val ex = docs.select(col("doc_id"), size(col("ss")).as("n"), explode(col("ss")).as("s"))
        // global canonical order = (document frequency asc, shingle)
        val df = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
        val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df").asc, col("s").asc)
        val prefixes = ex
          .join(df, "s")
          .withColumn("pos", row_number().over(wDoc))
          .filter(col("pos") <= col("n") - ceil(lit(tau) * col("n")) + 1)
          .select(col("doc_id"), col("n"), col("pos"), col("s"))
        // NB deliberately NOT persisted: AQE reuses the window
        // exchange across the self-join's two identical subtrees, and
        // a persist here measured ~1.8x slower (materialization cost
        // exceeds the recompute it saves).
        val cand = prefixes.as("x")
          .join(
            prefixes.as("y"),
            col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id") &&
              // PPJoin length filter (lossless, same bound as above)
              greatest(col("x.n"), col("y.n")) * tau <= least(col("x.n"), col("y.n")) &&
              // PPJoin POSITIONAL filter (Xiao et al., WWW'08; still
              // lossless): tokens shared beyond this occurrence all sit
              // at later positions, so overlap <= min(n-pos) + 1, and
              // J >= tau needs overlap >= tau/(1+tau) * (n1+n2). A true
              // match's FIRST shared prefix token always satisfies
              // this, so filtering per-occurrence keeps every real
              // pair. Measured at sf0.1: 310k -> 125k candidate pairs
              // before the distinct (tools.PpjoinProfile).
              (least(col("x.n") - col("x.pos"), col("y.n") - col("y.pos")) + 1) *
                (1.0 + tau) >= lit(tau) * (col("x.n") + col("y.n"))
          )
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          .distinct()
        val sets = docs.select(col("doc_id"), sort_array(col("ss")).as("ss"))
        cand
          .join(sets.as("s1"), col("d1") === col("s1.doc_id"))
          .join(sets.as("s2"), col("d2") === col("s2.doc_id"))
          .withColumn(
            "inter",
            graft.plans.GraftExtensions.sortedIntersectCount(col("s1.ss"), col("s2.ss"))
          )
          .select(
            col("d1"), col("d2"),
            (col("inter").cast(DoubleType) /
              (size(col("s1.ss")) + size(col("s2.ss")) - col("inter"))).as("j")
          )
          .filter(col("j") >= tau)
          .select(col("d1"), col("d2"), floor(col("j") * 1e6).cast("long").as("jaccard_micros"))
          .orderBy("d1", "d2")
      },
      Some(s"""WITH t AS (SELECT doc_id, $wordsSql AS w FROM documents),
        d AS (SELECT doc_id, $shinglesSql AS ss FROM t WHERE len(w) >= 3),
        ex AS (SELECT doc_id, unnest(ss) AS s FROM d),
        n AS (SELECT doc_id, len(ss) AS n FROM d),
        shared AS (SELECT x.doc_id AS d1, y.doc_id AS d2, COUNT(*) AS shared
          FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2)
        SELECT d1, d2,
          CAST(FLOOR(shared / (n1.n + n2.n - shared) * 1000000) AS BIGINT) AS jaccard_micros
        FROM shared JOIN n n1 ON d1 = n1.doc_id JOIN n n2 ON d2 = n2.doc_id
        WHERE shared / (n1.n + n2.n - shared) >= 0.5
        ORDER BY d1, d2""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_dedup_minhash_lsh",
      (s, dir) => {
        // MinHash(64) + LSH(32 bands x 2 rows) near-dup at tau=0.8:
        // signatures in one pass over collected shingle hashes, band
        // buckets joined for candidates, candidates verified with the
        // exact Jaccard — so the oracle is the exact-Jaccard SQL. Miss
        // probability per tau-pair is (1 - 0.8^2)^32 ≈ 6e-15.
        // This is the 100 TB dedup path: O(docs x bands) instead of
        // the quadratic shingle join.
        // The pipeline itself lives in operators.MinHashLsh, shared
        // with the 1M-doc scale run (tools.DedupScale) so the gate and
        // the scale evidence exercise the SAME definition.
        import graft.operators.MinHashLsh
        // eager localCheckpoint, not persist: consumed by both the
        // bucket join and the verify join, and checkpoint blocks
        // release with the RDD instead of leaking past the query
        // (the searchCascade hygiene pattern)
        val docs = MinHashLsh.prepare(
          Tables(s, dir, "documents")
            .select(col("doc_id"), TextKit.tokens(col("text")).as("w")),
          "doc_id", "w"
        ).localCheckpoint()
        val cand = MinHashLsh.candidates(docs, "doc_id")
        MinHashLsh.verify(docs, cand, "doc_id", tau = 0.8)
          .select(col("d1"), col("d2"), floor(col("j") * 1e6).cast("long").as("jaccard_micros"))
          .orderBy("d1", "d2")
      },
      Some(s"""WITH t AS (SELECT doc_id, $wordsSql AS w FROM documents),
        d AS (SELECT doc_id, $shinglesSql AS ss FROM t WHERE len(w) >= 3),
        ex AS (SELECT doc_id, unnest(ss) AS s FROM d),
        n AS (SELECT doc_id, len(ss) AS n FROM d),
        shared AS (SELECT x.doc_id AS d1, y.doc_id AS d2, COUNT(*) AS shared
          FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2)
        SELECT d1, d2,
          CAST(FLOOR(shared / (n1.n + n2.n - shared) * 1000000) AS BIGINT) AS jaccard_micros
        FROM shared JOIN n n1 ON d1 = n1.doc_id JOIN n n2 ON d2 = n2.doc_id
        WHERE shared / (n1.n + n2.n - shared) >= 0.8
        ORDER BY d1, d2""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_dedup_incremental",
      (s, dir) => {
        // INCREMENTAL (cross-batch) near-dup: dedup a NEW ingest batch
        // against the PERSISTED MinHash band index of everything
        // admitted before, without rescanning the prior corpus — the
        // missing production dedup shape (every real 100-TB corpus is
        // ingested continuously; whole-corpus re-dedup per batch is
        // quadratic in the ingest count). The fixture splits documents
        // deterministically (doc_id % 4 == 0 is "the new batch", the
        // rest "the already-indexed corpus"); in production the old
        // side is a parquet READ of the index table — (id, sorted
        // shingle set, bands), built once per admitted batch and
        // maintained by the crash-atomic upsert swap
        // (streaming/Streaming.upsertBatch; IncrementalDedupSpec runs
        // that full persisted cycle, tools/IncrementalScale measures
        // per-batch cost ∝ batch at a 1M-doc index). Same parameters
        // as q_dedup_minhash_lsh (3-shingles, 64 perms, 32x2 bands,
        // tau 0.8, per-pair miss ~6e-15), so the oracle is the exact
        // cross-batch Jaccard. One row per new-batch doc (house rule):
        // kept=false iff some indexed doc clears tau; dup_of is the
        // smallest such doc id and best_jaccard_micros the best score
        // (two independent aggregates — both deterministic and
        // replayable); docs too short to shingle trivially survive.
        import graft.operators.MinHashLsh
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id"), TextKit.tokens(col("text")).as("w"))
        val isNew = pmod(col("doc_id"), lit(4)) === 0
        // eager localCheckpoint on both prepared sides (the minhash
        // query's hygiene pattern): each feeds the bucket join AND the
        // verify join
        val idx = MinHashLsh.index(
          MinHashLsh.prepare(docs.filter(!isNew), "doc_id", "w"), "doc_id")
          .localCheckpoint()
        val newPrep = MinHashLsh.prepare(docs.filter(isNew), "doc_id", "w")
          .localCheckpoint()
        val cand = MinHashLsh.candidatesAgainst(newPrep, idx, "doc_id")
        val matches = MinHashLsh.verifyAgainst(newPrep, idx, cand, "doc_id", tau = 0.8)
          .groupBy(col("d_new"))
          .agg(min(col("d_old")).as("dup_of"), max(col("j")).as("bj"))
        docs.filter(isNew)
          .join(matches, col("doc_id") === col("d_new"), "left")
          .select(
            col("doc_id"),
            col("dup_of").isNull.as("kept"),
            col("dup_of"),
            floor(col("bj") * 1e6).cast("long").as("best_jaccard_micros"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, $wordsSql AS w FROM documents),
        d AS (SELECT doc_id, $shinglesSql AS ss FROM t WHERE len(w) >= 3),
        ex AS (SELECT doc_id, unnest(ss) AS s FROM d),
        n AS (SELECT doc_id, len(ss) AS n FROM d),
        shared AS (SELECT nw.doc_id AS dn, ol.doc_id AS dold, COUNT(*) AS shared
          FROM ex nw JOIN ex ol ON nw.s = ol.s
          WHERE nw.doc_id % 4 = 0 AND ol.doc_id % 4 != 0
          GROUP BY 1, 2),
        m AS (SELECT dn, dold, shared / (n1.n + n2.n - shared) AS j
          FROM shared JOIN n n1 ON dn = n1.doc_id JOIN n n2 ON dold = n2.doc_id
          WHERE shared / (n1.n + n2.n - shared) >= 0.8),
        b AS (SELECT dn, MIN(dold) AS dup_of, MAX(j) AS bj FROM m GROUP BY 1)
        SELECT doc_id, dup_of IS NULL AS kept, dup_of,
          CAST(FLOOR(bj * 1000000) AS BIGINT) AS best_jaccard_micros
        FROM (SELECT doc_id FROM documents WHERE doc_id % 4 = 0) nb
        LEFT JOIN b ON doc_id = dn
        ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_dedup_cdc_chunks",
      (s, dir) => {
        // CONTENT-DEFINED CHUNKING (the LBFS/storage-dedup rolling-
        // boundary rule — Muthitacharoen et al. 2001): chunk
        // boundaries fall where the 16-char window hash ≡ 0 mod 64,
        // so an edit shifts only the chunks it touches — the property
        // fixed-size chunking loses at the first insertion, and the
        // missing granularity BETWEEN document-level dedup
        // (q_dedup_exact) and substring-extent dedup
        // (q_dedup_substring_*): cross-document REGION dedup at
        // byte-range granularity without any pairwise comparison.
        // Report per doc: chunk count, chars, and how much of the doc
        // is dedupable (chunks whose content hash occurs >= 2 times
        // corpus-wide — within-doc repeats count too, exactly like a
        // chunk store). Hash collisions conflate chunks identically on
        // both engines (same fold); a production store confirms with a
        // 128-bit content hash (the q_dedup_exact rung) before
        // deduplicating bytes. Scale shape: per-doc window hashing is
        // map-side (O(len x w) compute, no shuffle); then ONE
        // partial-agg'd shuffle on the chunk hash (occurrence counts)
        // and one on doc_id — no all-pairs anywhere, the same
        // hash-groupBy skeleton as exact dedup. Oracle: every
        // boundary and chunk hash replays in closed form through the
        // shared polynomial fold (the q_text_fingerprint machinery).
        val docs = Tables(s, dir, "documents")
          .filter(col("doc_id").isNotNull && col("text").isNotNull &&
            length(col("text")) > 0)
          .select(col("doc_id"), TextKit.cdcChunks(col("text"), 16, 64).as("cs"))
        val occ = docs
          .select(col("doc_id"), explode(col("cs")).as("c"))
          .select(col("doc_id"), col("c.l").as("l"), col("c.h").as("h"))
          .localCheckpoint() // feeds the corpus-wide counts AND the per-doc agg
        val counts = occ.groupBy(col("h")).agg(count(lit(1)).as("n_occ"))
        occ.join(counts, "h")
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).cast("int").as("n_chunks"),
            sum(col("l")).as("total_chars"),
            sum(when(col("n_occ") >= 2, 1).otherwise(0)).cast("int").as("n_dedupable"),
            sum(when(col("n_occ") >= 2, col("l")).otherwise(0)).as("chars_dedupable"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, text FROM documents
                 WHERE doc_id IS NOT NULL AND text IS NOT NULL AND len(text) > 0),
        b AS (SELECT doc_id, text,
                list_filter(range(16, len(text) + 1),
                  i -> ${OracleSql.foldSql("substr(text, i - 15, 16)", 31)} % 64 = 0) AS bs
              FROM t),
        sp AS (SELECT doc_id, text,
                list_prepend(1, list_transform(bs, x -> x + 1)) AS ss,
                list_append(bs, len(text)) AS es
               FROM b),
        ch AS (SELECT doc_id, text,
                unnest(list_filter(
                  list_transform(range(1, len(ss) + 1),
                    k -> {'s': ss[k], 'l': es[k] - ss[k] + 1}),
                  p -> p.l > 0)) AS c
               FROM sp),
        occ AS (SELECT doc_id, c.l AS l,
                 ${OracleSql.foldSql("substr(text, c.s, c.l)", 31)} AS h
                FROM ch),
        cnt AS (SELECT h, COUNT(*) AS n_occ FROM occ GROUP BY 1)
        SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_chunks,
          CAST(SUM(l) AS BIGINT) AS total_chars,
          CAST(SUM(CASE WHEN n_occ >= 2 THEN 1 ELSE 0 END) AS INTEGER) AS n_dedupable,
          CAST(SUM(CASE WHEN n_occ >= 2 THEN l ELSE 0 END) AS BIGINT) AS chars_dedupable
        FROM occ JOIN cnt USING (h) GROUP BY doc_id ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_dedup_clusters_incremental",
      (s, dir) => {
        // INCREMENTAL CLUSTER MAINTENANCE, oracled end to end: the
        // fixture splits at the top-quarter id threshold (T = max*3
        // DIV 4, folded in as a 1-row broadcast — ids above T are
        // "the new ingest batch", satisfying the operator's monotone-
        // id contract), the old side's cluster map is built once
        // (components over old-old pairs, singletons self — the
        // persisted state a production pipeline reads from parquet),
        // and operators.IncrementalClusters.maintain updates it from
        // the new batch's cross-index and in-batch verified pairs
        // alone. The ORACLE is the whole-corpus clustering replay
        // (q_dedup_clusters' recursive CTE, singletons included):
        // valid precisely because of the operator's equality theorem —
        // incremental maintenance must equal the from-scratch
        // clustering at every batch boundary (IncrementalClustersSpec
        // proves the merge case; tools/IncClusterScale proves it at
        // 1M docs) — so this hash gate re-proves the theorem on every
        // fixture including the hostile one. NULL doc_id rows are
        // dropped on both engines: a cluster map is KEYED on identity,
        // and a row with none cannot hold a slot in it. Scale shape:
        // everything is the components/minhash machinery already
        // proven (banded candidates, codegen'd sorted-merge verify,
        // mini-graph closure); the only additions are one broadcast
        // threshold row and the batch-sized maintain joins.
        import graft.operators.{ConnectedComponents, IncrementalClusters, MinHashLsh}
        val docs = Tables(s, dir, "documents")
          .filter(col("doc_id").isNotNull)
          .select(col("doc_id"), TextKit.tokens(col("text")).as("w"))
        val thr = docs.agg(expr("MAX(doc_id) * 3 DIV 4").as("t"))
        val tagged = docs.crossJoin(broadcast(thr))
        val oldDocs = tagged.filter(col("doc_id") <= col("t")).drop("t")
        val newDocs = tagged.filter(col("doc_id") > col("t")).drop("t")
        val oldPrep = MinHashLsh.prepare(oldDocs, "doc_id", "w").localCheckpoint()
        val newPrep = MinHashLsh.prepare(newDocs, "doc_id", "w").localCheckpoint()
        val oldPairs = MinHashLsh
          .verify(oldPrep, MinHashLsh.candidates(oldPrep, "doc_id"), "doc_id", 0.8)
          .select(col("d1"), col("d2"))
        val oldMap = oldDocs.select(col("doc_id")).distinct()
          .join(
            ConnectedComponents.labels(oldPairs).withColumnRenamed("node", "doc_id"),
            Seq("doc_id"), "left_outer")
          .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
          .localCheckpoint()
        val idx = MinHashLsh.index(oldPrep, "doc_id")
        val cross = MinHashLsh.verifyAgainst(newPrep, idx,
          MinHashLsh.candidatesAgainst(newPrep, idx, "doc_id"), "doc_id", 0.8)
          .select(col("d_new"), col("d_old"))
        val inBatch = MinHashLsh
          .verify(newPrep, MinHashLsh.candidates(newPrep, "doc_id"), "doc_id", 0.8)
          .select(col("d1"), col("d2"))
        val delta = IncrementalClusters.maintain(
          oldMap, newDocs.select(col("doc_id")).distinct(), cross, inBatch)
          .localCheckpoint()
        oldMap
          .join(delta.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .unionByName(delta)
          .select(col("doc_id"), col("cluster").as("cluster_id"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE t AS (SELECT doc_id, $wordsSql AS w FROM documents
                 WHERE doc_id IS NOT NULL),
        d AS (SELECT doc_id, $shinglesSql AS ss FROM t WHERE len(w) >= 3),
        ex AS (SELECT doc_id, unnest(ss) AS s FROM d),
        n AS (SELECT doc_id, len(ss) AS n FROM d),
        shared AS (SELECT x.doc_id AS d1, y.doc_id AS d2, COUNT(*) AS shared
          FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2),
        pairs AS (SELECT d1, d2 FROM shared
          JOIN n n1 ON d1 = n1.doc_id JOIN n n2 ON d2 = n2.doc_id
          WHERE shared / (n1.n + n2.n - shared) >= 0.8),
        edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                  UNION SELECT d2, d1 FROM pairs),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        clus AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
                 FROM reach GROUP BY a),
        ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id IS NOT NULL)
        SELECT doc_id, COALESCE(cluster_id, doc_id) AS cluster_id
        FROM ids LEFT JOIN clus USING (doc_id) ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_dedup_clusters_removal",
      (s, dir) => {
        // DECREMENTAL CLUSTER MAINTENANCE — the retraction verb
        // (operators.IncrementalClusters.remove), oracled by the same
        // equality theorem as the ingest verb: after removing a doc
        // set, the incrementally-repaired map must equal the
        // from-scratch clustering of the corpus MINUS the removed
        // docs. The fixture removes the HARDEST set: the min-id member
        // of every multi-doc cluster (= the cluster id itself, by the
        // map invariant), so every repaired cluster must mint a new id
        // and any component held together by its min must split.
        // remove() reclusters ONLY the touched components over their
        // survivors' edges — exact because components are closed under
        // edges — and the oracle replays the whole reduced corpus
        // (second recursive closure over the removed-endpoint-filtered
        // edge set). Production deletes the removed ids' index/map rows
        // through the shard-scoped swap (deleteFromPartitioned) and
        // upserts these relabels; IncrementalClustersSpec pins that
        // flow plus the bridge-removal split, tools/IncClusterScale
        // times removal ∝ touched component at 1M docs.
        import graft.operators.{ConnectedComponents, IncrementalClusters, MinHashLsh}
        val docs = Tables(s, dir, "documents")
          .filter(col("doc_id").isNotNull)
          .select(col("doc_id"), TextKit.tokens(col("text")).as("w"))
        val prep = MinHashLsh.prepare(docs, "doc_id", "w").localCheckpoint()
        val pairs = MinHashLsh
          .verify(prep, MinHashLsh.candidates(prep, "doc_id"), "doc_id", 0.8)
          .select(col("d1"), col("d2")).localCheckpoint()
        val fullMap = docs.select(col("doc_id")).distinct()
          .join(
            ConnectedComponents.labels(pairs).withColumnRenamed("node", "doc_id"),
            Seq("doc_id"), "left_outer")
          .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
          .localCheckpoint()
        val removed = fullMap.groupBy(col("cluster"))
          .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
          .select(col("cluster").as("doc_id"))
        // survivors' edges: the verified pair set minus any pair
        // touching a removed endpoint. In production these come back
        // from the persisted index's stored shingle sets (a component-
        // sized semi-join); here the pair set is in hand and identical.
        val survEdges = pairs
          .join(removed.select(col("doc_id").as("d1")), Seq("d1"), "left_anti")
          .join(removed.select(col("doc_id").as("d2")), Seq("d2"), "left_anti")
          .select(col("d1"), col("d2"))
        val delta = IncrementalClusters.remove(fullMap, removed, survEdges)
          .localCheckpoint()
        fullMap
          .join(removed, Seq("doc_id"), "left_anti")
          .join(delta.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .unionByName(delta)
          .select(col("doc_id"), col("cluster").as("cluster_id"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE t AS (SELECT doc_id, $wordsSql AS w FROM documents
                 WHERE doc_id IS NOT NULL),
        d AS (SELECT doc_id, $shinglesSql AS ss FROM t WHERE len(w) >= 3),
        ex AS (SELECT doc_id, unnest(ss) AS s FROM d),
        n AS (SELECT doc_id, len(ss) AS n FROM d),
        shared AS (SELECT x.doc_id AS d1, y.doc_id AS d2, COUNT(*) AS shared
          FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2),
        pairs AS (SELECT d1, d2 FROM shared
          JOIN n n1 ON d1 = n1.doc_id JOIN n n2 ON d2 = n2.doc_id
          WHERE shared / (n1.n + n2.n - shared) >= 0.8),
        edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                  UNION SELECT d2, d1 FROM pairs),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        clus AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
                 FROM reach GROUP BY a),
        ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id IS NOT NULL),
        fullmap AS (SELECT doc_id, COALESCE(cluster_id, doc_id) AS cluster_id
                    FROM ids LEFT JOIN clus USING (doc_id)),
        removed AS (SELECT cluster_id AS doc_id FROM fullmap
                    GROUP BY cluster_id HAVING COUNT(*) >= 2),
        edges2 AS (SELECT a, b FROM edges
                   WHERE a NOT IN (SELECT doc_id FROM removed)
                     AND b NOT IN (SELECT doc_id FROM removed)),
        reach2(a, b) AS (
          SELECT a, b FROM edges2
          UNION
          SELECT r.a, e.b FROM reach2 r JOIN edges2 e ON r.b = e.a),
        clus2 AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
                  FROM reach2 GROUP BY a),
        surv AS (SELECT doc_id FROM ids
                 WHERE doc_id NOT IN (SELECT doc_id FROM removed))
        SELECT doc_id, COALESCE(cluster_id, doc_id) AS cluster_id
        FROM surv LEFT JOIN clus2 USING (doc_id) ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_dedup_clusters_edit",
      (s, dir) => {
        // EDIT (changed-document re-ingest) through the cluster map —
        // the remove-then-add verb (operators.IncrementalClusters
        // .edit), oracled by the equality theorem on an EDITED corpus:
        // every multi-doc cluster's min-id doc is re-crawled with the
        // NEXT doc id's original text (a deterministic content swap
        // both engines replay; the max id, having no successor, keeps
        // its own text — a no-op edit, also a case worth gating). The
        // incremental path repairs each edited doc's OLD neighborhood
        // and re-admits the NEW content against the unedited index;
        // the oracle re-runs the whole shingle/jaccard/closure chain
        // on the swapped corpus. Both engines canonicalize to one row
        // per doc_id first (latest-wins MAX(text) — the curation
        // stage-0 policy), because an edit is keyed on identity.
        import graft.operators.{ConnectedComponents, IncrementalClusters, MinHashLsh}
        val docs = Tables(s, dir, "documents")
          .filter(col("doc_id").isNotNull)
          .groupBy(col("doc_id")).agg(max(col("text")).as("text"))
          .localCheckpoint()
        val toks = docs.select(col("doc_id"), TextKit.tokens(col("text")).as("w"))
        val prep = MinHashLsh.prepare(toks, "doc_id", "w").localCheckpoint()
        val pairs = MinHashLsh
          .verify(prep, MinHashLsh.candidates(prep, "doc_id"), "doc_id", 0.8)
          .select(col("d1"), col("d2")).localCheckpoint()
        val fullMap = docs.select(col("doc_id"))
          .join(
            ConnectedComponents.labels(pairs).withColumnRenamed("node", "doc_id"),
            Seq("doc_id"), "left_outer")
          .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
          .localCheckpoint()
        val edited = fullMap.groupBy(col("cluster"))
          .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
          .select(col("cluster").as("doc_id"))
        // new content: the next id's ORIGINAL text, own text fallback
        val newDocs = edited
          .join(docs.select(col("doc_id"), col("text").as("own")), Seq("doc_id"))
          .join(docs.select((col("doc_id") - 1).as("doc_id"), col("text").as("nxt")),
            Seq("doc_id"), "left_outer")
          .select(col("doc_id"),
            TextKit.tokens(coalesce(col("nxt"), col("own"))).as("w"))
        val newPrep = MinHashLsh.prepare(newDocs, "doc_id", "w").localCheckpoint()
        // old-neighborhood survivor edges: the verified pairs minus any
        // touching an edited endpoint (remove()'s repair input)
        val survEdges = pairs
          .join(edited.select(col("doc_id").as("d1")), Seq("d1"), "left_anti")
          .join(edited.select(col("doc_id").as("d2")), Seq("d2"), "left_anti")
          .select(col("d1"), col("d2"))
        // new-content edges vs the UNEDITED rest of the index, and
        // among the edited docs themselves
        val restIdx = MinHashLsh.index(
          prep.join(edited, Seq("doc_id"), "left_anti"), "doc_id")
        val cross = MinHashLsh.verifyAgainst(newPrep, restIdx,
          MinHashLsh.candidatesAgainst(newPrep, restIdx, "doc_id"), "doc_id", 0.8)
          .select(col("d_new"), col("d_old"))
        val inBatch = MinHashLsh
          .verify(newPrep, MinHashLsh.candidates(newPrep, "doc_id"), "doc_id", 0.8)
          .select(col("d1"), col("d2"))
        val delta = IncrementalClusters
          .edit(fullMap, edited, survEdges, cross, inBatch)
          .localCheckpoint()
        fullMap
          .join(edited, Seq("doc_id"), "left_anti")
          .join(delta.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .unionByName(delta)
          .select(col("doc_id"), col("cluster").as("cluster_id"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE t0 AS (SELECT doc_id, MAX(text) AS text FROM documents
                 WHERE doc_id IS NOT NULL GROUP BY doc_id),
        t AS (SELECT doc_id, $wordsSql AS w FROM t0),
        d AS (SELECT doc_id, $shinglesSql AS ss FROM t WHERE len(w) >= 3),
        ex AS (SELECT doc_id, unnest(ss) AS s FROM d),
        n AS (SELECT doc_id, len(ss) AS n FROM d),
        shared AS (SELECT x.doc_id AS d1, y.doc_id AS d2, COUNT(*) AS shared
          FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2),
        pairs AS (SELECT d1, d2 FROM shared
          JOIN n n1 ON d1 = n1.doc_id JOIN n n2 ON d2 = n2.doc_id
          WHERE shared / (n1.n + n2.n - shared) >= 0.8),
        edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                  UNION SELECT d2, d1 FROM pairs),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        clus AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
                 FROM reach GROUP BY a),
        fullmap AS (SELECT doc_id, COALESCE(cluster_id, doc_id) AS cluster_id
                    FROM t0 LEFT JOIN clus USING (doc_id)),
        edited AS (SELECT cluster_id AS doc_id FROM fullmap
                   GROUP BY cluster_id HAVING COUNT(*) >= 2),
        t2 AS (SELECT a.doc_id,
                 CASE WHEN a.doc_id IN (SELECT doc_id FROM edited)
                      THEN COALESCE(b.text, a.text) ELSE a.text END AS text
               FROM t0 a LEFT JOIN t0 b ON b.doc_id = a.doc_id + 1),
        tt2 AS (SELECT doc_id, $wordsSql AS w FROM t2),
        dd2 AS (SELECT doc_id, $shinglesSql AS ss FROM tt2 WHERE len(w) >= 3),
        ex2 AS (SELECT doc_id, unnest(ss) AS s FROM dd2),
        n2 AS (SELECT doc_id, len(ss) AS n FROM dd2),
        shared2 AS (SELECT x.doc_id AS d1, y.doc_id AS d2, COUNT(*) AS shared
          FROM ex2 x JOIN ex2 y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2),
        pairs2 AS (SELECT d1, d2 FROM shared2
          JOIN n2 a2 ON d1 = a2.doc_id JOIN n2 b2 ON d2 = b2.doc_id
          WHERE shared / (a2.n + b2.n - shared) >= 0.8),
        edges2 AS (SELECT d1 AS a, d2 AS b FROM pairs2
                   UNION SELECT d2, d1 FROM pairs2),
        reach2(a, b) AS (
          SELECT a, b FROM edges2
          UNION
          SELECT r.a, e.b FROM reach2 r JOIN edges2 e ON r.b = e.a),
        clus2 AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
                  FROM reach2 GROUP BY a)
        SELECT doc_id, COALESCE(cluster_id, doc_id) AS cluster_id
        FROM t0 LEFT JOIN clus2 USING (doc_id) ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_dedup_clusters",
      (s, dir) => {
        // Near-dup CLUSTERING: pairs alone don't dedup — the canonical
        // mapping needs transitive components. Pairs come from the
        // MinHash+LSH pipeline (identical to the exact-Jaccard set at
        // tau=0.8, see q_dedup_minhash_lsh), components via min-label
        // propagation (operators.ConnectedComponents). Oracle: a
        // recursive-CTE reachability closure over the exact pair set.
        val w = TextKit.tokens(col("text"))
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id"), w.as("w"))
          .filter(size(col("w")) >= 3)
          .select(col("doc_id"), TextKit.shinglesKernel(3)(col("w")).as("ss"))
          .withColumn("hs", transform(col("ss"), sh => pmod(xxhash64(sh), lit(P))))
          .withColumn("bands", TextKit.minhashBands(64, 2)(col("hs")))
          // eager localCheckpoint, not persist: consumed by the bucket
          // join, the verify join, and the component labeling; persist
          // would leak CacheManager entries (PlanAuditSpec guard)
          .localCheckpoint()
        val buckets = docs.select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bkey")))
        val cand = buckets.as("x")
          .join(
            buckets.as("y"),
            col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
              col("x.doc_id") < col("y.doc_id")
          )
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          .distinct()
        val sets = docs.select(col("doc_id"), sort_array(col("ss")).as("ss"))
        val pairs = cand
          .join(sets.as("s1"), col("d1") === col("s1.doc_id"))
          .join(sets.as("s2"), col("d2") === col("s2.doc_id"))
          .withColumn(
            "inter",
            graft.plans.GraftExtensions.sortedIntersectCount(col("s1.ss"), col("s2.ss"))
          )
          .filter(
            col("inter").cast(DoubleType) /
              (size(col("s1.ss")) + size(col("s2.ss")) - col("inter")) >= 0.8
          )
          .select(col("d1"), col("d2"))
        graft.operators.ConnectedComponents
          .labels(pairs)
          .select(col("node").as("doc_id"), col("cluster").as("cluster_id"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE t AS (SELECT doc_id, $wordsSql AS w FROM documents),
        d AS (SELECT doc_id, $shinglesSql AS ss FROM t WHERE len(w) >= 3),
        ex AS (SELECT doc_id, unnest(ss) AS s FROM d),
        n AS (SELECT doc_id, len(ss) AS n FROM d),
        shared AS (SELECT x.doc_id AS d1, y.doc_id AS d2, COUNT(*) AS shared
          FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2),
        pairs AS (SELECT d1, d2 FROM shared
          JOIN n n1 ON d1 = n1.doc_id JOIN n n2 ON d2 = n2.doc_id
          WHERE shared / (n1.n + n2.n - shared) >= 0.8),
        edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                  UNION SELECT d2, d1 FROM pairs),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
        FROM reach GROUP BY a ORDER BY 1""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_dedup_clusters_deep",
      (s, dir) => {
        // DEEP-diameter component clustering — the boundary
        // q_dedup_clusters deliberately scopes out: min-label
        // propagation costs O(diameter) rounds, so chain-shaped
        // components (lineage graphs, page-link paths, sequential
        // near-dup runs) need the large-star/small-star contraction
        // (operators.StarContraction, Kiveris et al. 2014), which
        // converges in O(log^2 n) alternations (~2 log2 n in
        // practice) at ANY diameter. The
        // graph here is each source's documents chained in doc_id
        // order (per-source paths up to 250 hops at sf0.1 — already
        // past propagation's default 20-round guard, which THROWS on
        // this input; see OperatorsSpec). On well-formed data the
        // components are exactly the sources; the oracle REPLAYS the
        // edge construction and closes over it recursively, so a
        // hostile doc_id appearing in two sources (which genuinely
        // bridges their chains — node identity is the id) agrees
        // cross-engine too instead of being a documented divergence. The lead()
        // window is PARTITIONED by source — no global window — and
        // every contraction round is a partial-agg'd groupBy + an
        // equi-join on the node key. Fixture-scale cost (~6-8 s at
        // sf0.1) is ~9 alternations x fixed per-round job overhead —
        // the toy-scale premium of a plan whose work is O(|E|) per
        // round with a diameter-independent round count
        // (tools.DeepCcScale: 1M nodes at diameter 9,999 in 39 s);
        // the shallow-graph rung stays q_dedup_clusters (cheaper
        // rounds, O(diameter) count).
        val d = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
        val wNext = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        // self-edge guard: a doc_id duplicated WITHIN one source would
        // make lead() pair the id with itself; a (k, k) edge carries
        // no connectivity and is dropped on both engines
        val edges = d
          .withColumn("nxt", lead(col("doc_id"), 1).over(wNext))
          .filter(col("nxt").isNotNull && col("nxt") =!= col("doc_id"))
          .select(col("doc_id").as("a"), col("nxt").as("b"))
        val labels = graft.operators.StarContraction.labels(edges)
        // left-join keeps one row per document even for a
        // single-doc source (no edges -> self-labeled)
        d.join(labels, d("doc_id") === labels("node"), "left_outer")
          .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster_id"))
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE d AS (SELECT doc_id, source FROM documents),
        -- the oracle replays the GRAPH the Spark side actually builds
        -- (per-source consecutive edges) and closes over it, rather
        -- than assuming cluster == per-source minimum: a doc_id
        -- appearing in TWO sources genuinely bridges their chains
        -- (node identity is the doc_id), which the per-source-min
        -- shortcut could not see — that was this query's documented
        -- chaos divergence, now closed. Components are invariant to
        -- how ties order within a chain, so the closure is exact even
        -- where lead() order is arbitrary.
        e0 AS (SELECT doc_id AS a,
                      LEAD(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS b
               FROM d),
        e1 AS (SELECT a, b FROM e0 WHERE b IS NOT NULL AND a != b),
        edges AS (SELECT a, b FROM e1 UNION SELECT b, a FROM e1),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        lbl AS (SELECT a AS node, LEAST(a, MIN(b)) AS cluster
                FROM reach GROUP BY a)
        SELECT doc_id, COALESCE(lbl.cluster, doc_id) AS cluster_id
        FROM d LEFT JOIN lbl ON d.doc_id = lbl.node
        ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_dedup_simhash",
      (s, dir) => {
        // 62-bit SimHash per document: sign of the tf-weighted sum of
        // each word-hash bit. The word hash is the engine-portable
        // charHash62, so DuckDB recomputes the identical sketch.
        val w = TextKit.tokens(col("text"))
        val wc = Tables(s, dir, "documents")
          .select(col("doc_id"), explode(w).as("word"))
          .groupBy(col("doc_id"), col("word"))
          .agg(count(lit(1)).as("c"))
          .withColumn("hh", TextKit.charHash62(col("word")))
        val bits = wc
          .select(col("doc_id"), col("c"), col("hh"), explode(sequence(lit(0), lit(61))).as("i"))
          .withColumn(
            "contrib",
            when(expr("shiftright(hh, i) % 2") === 1, col("c")).otherwise(-col("c"))
          )
          .groupBy(col("doc_id"), col("i"))
          .agg(sum(col("contrib")).as("s"))
        bits
          .groupBy(col("doc_id"))
          .agg(sum(when(col("s") > 0, expr("shiftleft(1L, i)")).otherwise(lit(0L))).as("simhash"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, unnest($wordsSql) AS word FROM documents),
        wc AS (SELECT doc_id, word, COUNT(*) AS c FROM t GROUP BY 1, 2),
        h AS (SELECT doc_id, c,
                ${foldSql("word", 31)} * 2147483648 + ${foldSql("word", 37)} AS hh
              FROM wc),
        bits AS (SELECT doc_id, i,
                SUM(CASE WHEN ((hh >> i) & 1) = 1 THEN c ELSE -c END) AS s
              FROM h, (SELECT unnest(range(0, 62)) AS i) GROUP BY 1, 2)
        SELECT doc_id,
          CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY 1 ORDER BY 1""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_text_chunking",
      (s, dir) => {
        // Overlapping token-window chunking — the canonical LLM
        // training-data preprocessing step: window W=16 tokens, stride
        // S=12 (overlap 4), short tails kept. See [[chunkWindows]];
        // embarrassingly parallel, no shuffle until the presentation
        // orderBy.
        chunkWindows(s, dir).orderBy("doc_id", "chunk_id")
      },
      Some(s"""WITH $chunkCteSql
        SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
          CAST(len($chunkSliceSql) AS INT) AS n_tokens,
          -- COALESCE: DuckDB's array_to_string([]) is NULL where
          -- Spark's array_join([]) is '' — an empty/whitespace doc
          -- still yields its one 0-token chunk with chunk_text ''
          COALESCE(array_to_string($chunkSliceSql, ' '), '') AS chunk_text
        FROM c ORDER BY doc_id, chunk_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_chunk_packing",
      (s, dir) => {
        // Concat-and-cut sequence packing: concatenate the chunk
        // stream in (doc_id, chunk_id) order and cut every 256 tokens
        // — each chunk's training bin is its global starting offset
        // div 256, exactly how pipelines pack documents into fixed
        // context windows. The global running token count is the
        // partition-less-window scale killer AGAIN (sum flavor this
        // time), so it runs through operators.PrefixSum — the
        // range-partition two-pass exact prefix sum — and the
        // hash-equality against the oracle's global window SUM is the
        // cutover's correctness proof, like GlobalRank's in the scaled
        // cascade. Integer addition is associative, so distributed ==
        // sequential EXACTLY.
        import graft.operators.PrefixSum
        // Packing REQUIRES a total order (every downstream offset
        // depends on it). (doc_id, chunk_id) is total only while
        // doc_id is unique, so the content hash joins the sort key as
        // a tie-break: corrupt inputs carrying two different documents
        // under one id (the chaos-fixture probe) still pack
        // deterministically and identically in both engines; rows tied
        // on all three keys are bit-identical, so any order of them
        // yields the same output multiset.
        val ch = chunkWindows(s, dir)
          .select(col("doc_id"), col("chunk_id"), col("n_tokens").cast("long").as("n_tokens"),
            TextKit.charHash(col("chunk_text")).as("tb"))
        PrefixSum
          .runningSum(
            ch, Seq(col("doc_id").asc, col("chunk_id").asc, col("tb").asc),
            "n_tokens", "cum_tokens")
          .select(
            col("doc_id"),
            col("chunk_id"),
            col("n_tokens"),
            col("cum_tokens"),
            expr("(cum_tokens - n_tokens) div 256").cast("int").as("pack_id")
          )
          .orderBy("doc_id", "chunk_id")
      },
      Some(s"""WITH $chunkCteSql,
        k AS (SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
                     CAST(len($chunkSliceSql) AS BIGINT) AS n_tokens,
                     ${OracleSql.foldSql(
          s"COALESCE(array_to_string($chunkSliceSql, ' '), '')", 31)} AS tb
              FROM c),
        r AS (SELECT doc_id, chunk_id, n_tokens,
                     CAST(SUM(n_tokens) OVER (ORDER BY doc_id, chunk_id, tb
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS cum_tokens
              FROM k)
        SELECT doc_id, chunk_id, n_tokens, cum_tokens,
               CAST((cum_tokens - n_tokens) // 256 AS INT) AS pack_id
        FROM r ORDER BY doc_id, chunk_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_text_bm25",
      (s, dir) => {
        // BM25 relevance scoring of every (document, frequent-term)
        // pair — the classic quality/retrieval scorer a training-data
        // pipeline runs corpus-wide (k1=1.2, b=0.75, df>=20 LUT).
        // tf (the (doc, term) fact table) is consumed twice (df LUT +
        // final join) and dl once: all three RECOMPUTE from the
        // columnar scan instead of caching — the r10 2M-doc probe
        // (tools.LmScale's corpus) OOMed the 8 GB local JVM on the
        // deserialized localCheckpoint blocks of the corpus-sized tf,
        // and at 100 TB a cached corpus-sized intermediate can never
        // be assumed resident; repeated columnar scans are the
        // unconditionally-scaling trade (same choice as
        // q_quality_lm_perplexity's bigram stream). The corpus
        // scalars (N, avgdl) cross the driver as an O(1) fold (the
        // reference's scalar-fold pattern, Search.scala:605) and come
        // back as literals. The df LUT broadcasts — BOUNDED because
        // df>=20 keeps only the frequent-term head, which Zipf caps
        // regardless of corpus size (the 2M synthetic corpus has 1.6M
        // singleton terms and a 24-term LUT). dl is corpus-sized
        // (one row per doc), so its join pins shuffle_hash — AQE's
        // compressed-bytes threshold underestimates string-light
        // tables and would broadcast it (the lm_perplexity lesson).
        // The score is one double expression mirrored token-for-token
        // in the oracle, surfaced as floor(x*1e6) micros (the
        // bit-exact compare recipe — see searchCascade's multiplier).
        val k1 = 1.2
        val b = 0.75
        val toks = TextKit.tokens(col("text"))
        def ex = Tables(s, dir, "documents")
          .select(col("doc_id"), explode(toks).as("term"))
        def tf = ex.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        // dl = token occurrences per doc == sum of tfs, one agg level less
        val dl = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        val firstRow = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("s")).first()
        val nDocs = firstRow.getLong(0)
        // empty corpus: SUM is null (getLong would NPE) and avgdl
        // would divide by zero — any placeholder works because the
        // joins below are over the same empty tf, so no row ever
        // evaluates the score expression
        val avgdl =
          if (nDocs == 0L) 1.0 else firstRow.getLong(1).toDouble / nDocs
        val dfLut = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
          .filter(col("df") >= 20)
        val idf = log((lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
        val score = idf * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl)))
        tf.join(broadcast(dfLut), "term")
          .join(dl.hint("shuffle_hash"), "doc_id")
          .select(
            col("doc_id"),
            col("term"),
            col("tf"),
            floor(score * lit(1e6)).cast("long").as("bm25_micros")
          )
          .orderBy("doc_id", "term")
      },
      Some(s"""WITH ex AS (
          SELECT doc_id, unnest($wordsSql) AS term FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ex GROUP BY 1, 2),
        dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        corpus AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                          CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1 HAVING COUNT(*) >= 20)
        SELECT t.doc_id, t.term, CAST(t.tf AS BIGINT) AS tf,
          CAST(FLOOR(LN((corpus.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * (t.tf * (1.2 + 1.0))
               / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / corpus.avgdl))
               * 1000000.0) AS BIGINT) AS bm25_micros
        FROM tf t JOIN df USING (term) JOIN dl USING (doc_id), corpus
        ORDER BY 1, 2""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_corpus_shuffle",
      (s, dir) => {
        // Deterministic corpus shuffle + shard assignment — the step
        // before any large-scale training run: give every document a
        // portable pseudo-random sort key (the engine-portable charHash
        // of doc_id + a salt literal, so DuckDB derives the identical
        // permutation), take the exact global position via the
        // distributed two-pass GlobalRank (its second consumer after
        // the scaled cascade — a partition-less window here would
        // funnel the whole corpus through one task), and deal
        // round-robin into 8 shards. At cluster scale the follow-on is
        // write.partitionBy("shard"); the assignment itself never
        // leaves the executors.
        import graft.operators.GlobalRank
        val skey = TextKit.charHash(concat(col("doc_id").cast("string"), lit("#shuf42")))
        val docs = Tables(s, dir, "documents").select(col("doc_id"), skey.as("skey"))
        GlobalRank.rowNumber(docs, Seq(col("skey").asc, col("doc_id").asc), "pos")
          .select(
            col("doc_id"),
            col("skey"),
            col("pos"),
            ((col("pos") - 1) % 8).cast("int").as("shard")
          )
          .orderBy("doc_id")
      },
      Some(s"""WITH h AS (
          SELECT doc_id,
                 ${foldSql("CAST(doc_id AS VARCHAR) || '#shuf42'", 31)} AS skey
          FROM documents),
        r AS (SELECT doc_id, skey,
                     ROW_NUMBER() OVER (ORDER BY skey, doc_id) AS pos FROM h)
        SELECT doc_id, skey, pos, CAST((pos - 1) % 8 AS INT) AS shard
        FROM r ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_corpus_mixture",
      (s, dir) => {
        // Weighted source mixing — re-weight a multi-source corpus by
        // per-source keep rates (the data-mixture step of a training
        // pipeline). The keep decision is a pure function of the
        // document id: portable hash mod 1000 under the per-source
        // permille from a broadcast literal map (default 100 permille)
        // — deterministic on any cluster, no RNG state, and the oracle
        // replays the identical rule. Output is the kept rows
        // themselves, so the gate checks exact membership, not counts.
        val permille = typedLit(mixturePermille)
        val hmod = mixtureHmod(col("doc_id"))
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"), hmod.as("hmod"),
            coalesce(permille(col("source")), lit(100)).as("keep_permille"))
          .filter(col("hmod") < col("keep_permille"))
          .orderBy("doc_id")
      },
      Some(s"""WITH h AS (
          SELECT doc_id, source,
                 ${foldSql("CAST(doc_id AS VARCHAR) || '#mix7'", 31)} % 1000 AS hmod,
                 $mixturePermilleSql AS keep_permille
          FROM documents)
        SELECT doc_id, source, hmod, CAST(keep_permille AS INT) AS keep_permille
        FROM h WHERE hmod < keep_permille ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_corpus_split",
      (s, dir) => {
        // Deterministic train/val/test split — the holdout step a
        // training pipeline needs before its contamination checks
        // mean anything. Membership is a pure function of the
        // document IDENTITY (id + split salt), never the content:
        // re-crawled or re-cleaned text keeps its split, so an eval
        // example can never migrate into train across pipeline
        // versions (the leakage mode content-keyed splits suffer; a
        // held-out doc whose text changes would otherwise hash into
        // the other side). 90/5/5 by portable hash mod 100 — the
        // oracle replays the identical rule, and the mixture/shuffle
        // salts differ so the three id-keyed decisions stay
        // independent. Shuffle-free single projection: at 100 TB this
        // is a scan-speed pass whose follow-on is
        // write.partitionBy("split").
        val bucket =
          (TextKit.charHash(concat(col("doc_id").cast("string"), lit("#split19"))) % 100)
            .cast("int")
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"), bucket.as("bucket"))
          .withColumn("split",
            when(col("bucket") < 90, "train")
              .when(col("bucket") < 95, "val")
              .otherwise("test"))
          .orderBy("doc_id")
      },
      Some(s"""WITH h AS (
          SELECT doc_id, source,
                 CAST(${foldSql("CAST(doc_id AS VARCHAR) || '#split19'", 31)} % 100 AS INT) AS bucket
          FROM documents)
        SELECT doc_id, source, bucket,
          CASE WHEN bucket < 90 THEN 'train'
               WHEN bucket < 95 THEN 'val'
               ELSE 'test' END AS split
        FROM h ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_corpus_dsir",
      (s, dir) => {
        // DSIR importance resampling (Xie et al. 2023, "Data Selection
        // for Language Models via Importance Resampling"): weight each
        // raw document by how target-domain-like its hashed n-gram
        // feature distribution is, then select the high-importance
        // subset. Target sample here: the lang='en' slice (standing in
        // for the paper's Wikipedia/books formal-text sample); raw =
        // the whole corpus. Features are the paper's hashed unigrams +
        // bigrams into B=1024 buckets (the engine-portable charHash,
        // so the oracle replays identical buckets); bucket
        // distributions get add-one smoothing, and a document's log
        // importance weight is the mean over its feature positions of
        //   ln p_target(bucket) - ln p_raw(bucket),
        // selected iff > 0 (more target-like than raw). The fourth
        // member of the quality/selection family: Gopher rules (shape),
        // LM perplexity (fluency), mixture permille (source balance),
        // DSIR (domain match). Scale shape: the bucket LUT is
        // B-BOUNDED BY CONSTRUCTION — that is DSIR's design point, the
        // hash collapses an unbounded vocabulary into a fixed table —
        // so the per-position weight lookup is a broadcast join at any
        // corpus size (contrast the perplexity query's provably
        // unbounded count table, which must shuffle); the per-doc fold
        // reuses the exact-decimal log-sum recipe, and the final
        // per-doc join pins shuffle_hash (corpus-proportional side —
        // the LmScale lesson). One row per doc incl. degenerate docs.
        val B = DsirBuckets
        val base = Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), TextKit.tokens(col("text")).as("w"))
        val bigrams = when(size(col("w")) < 2, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(1), size(col("w")) - 1),
            i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1))))
        val feats = base
          .select(col("doc_id"), col("lang"), explode(col("w")).as("g"))
          .unionByName(base.select(col("doc_id"), col("lang"), explode(bigrams).as("g")))
          .select(col("doc_id"), col("lang"), (TextKit.charHash(col("g")) % B).as("b"))
        // ONE corpus pass builds both bucket counts (conditional agg),
        // and the totals derive from the <= B-row count table — the
        // corpus-sized feature stream is scanned exactly twice overall
        // (LUT build + per-doc scoring), not four times
        val counts = feats.groupBy(col("b")).agg(
          count(lit(1)).as("cr"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
        val tot = counts.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
        val lut = counts
          .crossJoin(broadcast(tot))
          .select(
            col("b"),
            round(
              log((col("ct") + 1).cast("double") /
                (col("nt") + B).cast("double")) -
                log((col("cr") + 1).cast("double") / (col("nr") + B).cast("double")),
              9).cast("decimal(18,9)").as("lw"))
        val perDoc = feats
          .join(broadcast(lut), Seq("b"))
          .groupBy(col("doc_id"))
          .agg(sum(col("lw")).as("slw"), count(lit(1)).as("n"))
        base.select(col("doc_id"))
          .join(perDoc.hint("shuffle_hash"), Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            coalesce(col("n"), lit(0L)).cast("int").as("n_features"),
            round(col("slw").cast("double") / col("n"), 6).as("log_weight"),
            coalesce(col("slw").cast("double") / col("n") > 0, lit(false)).as("selected"))
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, lang, $wordsSql AS w FROM documents),
        uni AS (SELECT doc_id, lang, unnest(w) AS g FROM d),
        bi AS (SELECT doc_id, lang, unnest(list_transform(range(1, len(w)),
                 i -> w[i] || ' ' || w[i+1])) AS g FROM d),
        f AS (SELECT doc_id, lang, (${OracleSql.foldSql("g", 31)}) % $DsirBuckets AS b
              FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
        c AS (SELECT b, COUNT(*) AS cr,
                     SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
              FROM f GROUP BY 1),
        tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM c),
        lut AS (SELECT b,
                  CAST(ROUND(LN(CAST(ct + 1 AS DOUBLE) / CAST(nt + $DsirBuckets AS DOUBLE))
                           - LN(CAST(cr + 1 AS DOUBLE) / CAST(nr + $DsirBuckets AS DOUBLE)), 9)
                       AS DECIMAL(18,9)) AS lw
                FROM c, tot),
        s AS (SELECT doc_id, SUM(lw) AS slw, COUNT(*) AS n
              FROM f JOIN lut USING (b) GROUP BY 1)
        SELECT d.doc_id, CAST(COALESCE(n, 0) AS INTEGER) AS n_features,
               ROUND(CAST(slw AS DOUBLE) / n, 6) AS log_weight,
               COALESCE(CAST(slw AS DOUBLE) / n > 0, FALSE) AS selected
        FROM d LEFT JOIN s USING (doc_id) ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_quality_classifier",
      (s, dir) => {
        // TRAINED quality classifier (the fastText-shaped rung the
        // quality family lacked — Gopher is rules, perplexity is
        // fluency, DSIR is domain match, mixture is balance; this one
        // is a MODEL fit to labels): multinomial Naive Bayes over
        // B=1024 hashed unigram features. The training label is the
        // LANGID RULE'S VERDICT (langidPred == 'en', the exact rule
        // q_text_langid ships) — the production shape of this rung:
        // distill an expensive labeler (rules over curated lists;
        // in real pipelines an LLM- or human-labeled sample) into a
        // cheap linear model that scores the whole corpus. The
        // table's lang COLUMN is deliberately not the label: the
        // fixture generator draws text independently of it, so it is
        // unlearnable from content — a classifier "fit" to it would
        // be a coin toss wearing a model's clothes. Scoring:
        //   score(d) = ln((d1+1)/(d0+1))                     [prior]
        //      + sum_t [ln((B*c1(b_t)+1)/(B*(n1+1)))
        //             - ln((B*c0(b_t)+1)/(B*(n0+1)))]
        // predicted = score > 0. The smoothing is LIDSTONE alpha=1/B
        // (total pseudo-mass one token per class), NOT add-one: with B
        // buckets of add-one mass, any class whose token count is
        // below B gets uniformized toward 1/B and every
        // likelihood-ratio term inflates toward the big class — at
        // fixture scale the minority class holds ~900 tokens against
        // B=1024 pseudo-counts and the "model" degenerates to a
        // constant verdict (measured). The same hazard exists at 100
        // TB whenever a label is rare; alpha=1/B keeps the smoothing
        // mass independent of the bucket count. All smoothing
        // arguments stay integers, so both engines fold identically.
        // Training is CLOSED-FORM (counts are
        // the sufficient statistic), which is what makes this rung
        // exactly oracle-replayable — a gradient-trained linear model
        // (fastText/LogisticRegression) has engine-specific float
        // iteration no oracle can replay; tools/ClassifierScale
        // demonstrates that variant with MLlib LogisticRegression on
        // the same hashed features at 1M docs and verifies the two
        // agree where it matters. Scale shape: identical to DSIR —
        // the LUT is B-bounded by construction (broadcastable at ANY
        // corpus size), one corpus pass builds both class-conditional
        // count columns, the prior folds in as a 1-row broadcast
        // crossJoin (the llrCells scalar pattern), per-doc fold uses
        // the exact-decimal log-sum recipe, final join pins
        // shuffle_hash. One row per doc (degenerate-docs house rule):
        // no tokens -> the prior decides alone.
        val B = DsirBuckets
        val withHits = withLangHits(
          Tables(s, dir, "documents")
            .select(col("doc_id"), TextKit.tokens(col("text")).as("w")))
        val Seq(hde, hen, hes, hfr, hzh) =
          Seq("de", "en", "es", "fr", "zh").map(l => col(s"h_$l"))
        val base = withHits
          .select(col("doc_id"),
            (langidPred(hde, hen, hes, hfr, hzh) === "en").as("is_en"),
            col("w"))
        val feats = base
          .select(col("doc_id"), col("is_en"), explode(col("w")).as("g"))
          .select(col("doc_id"), col("is_en"), (TextKit.charHash(col("g")) % B).as("b"))
        val counts = feats.groupBy(col("b")).agg(
          sum(when(col("is_en"), 1L).otherwise(0L)).as("c1"),
          sum(when(!col("is_en"), 1L).otherwise(0L)).as("c0"))
        val tot = counts.agg(sum(col("c1")).as("n1"), sum(col("c0")).as("n0"))
        val prior = base.agg(
          sum(when(col("is_en"), 1L).otherwise(0L)).as("d1"),
          sum(when(!col("is_en"), 1L).otherwise(0L)).as("d0"))
          .select(round(
            log((col("d1") + 1).cast("double") / (col("d0") + 1).cast("double")),
            9).cast("decimal(18,9)").as("prior"))
        val lut = counts
          .crossJoin(broadcast(tot))
          .select(
            col("b"),
            round(
              log((col("c1") * B + 1).cast("double") /
                ((col("n1") + 1) * B).cast("double")) -
                log((col("c0") * B + 1).cast("double") /
                  ((col("n0") + 1) * B).cast("double")),
              9).cast("decimal(18,9)").as("lw"))
        val perDoc = feats
          .join(broadcast(lut), Seq("b"))
          .groupBy(col("doc_id"))
          .agg(sum(col("lw")).as("slw"), count(lit(1)).as("n"))
        val score = coalesce(col("slw"), lit(0).cast("decimal(18,9)")) + col("prior")
        base.select(col("doc_id"), col("is_en"))
          .crossJoin(broadcast(prior))
          .join(perDoc.hint("shuffle_hash"), Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            coalesce(col("n"), lit(0L)).cast("int").as("n_features"),
            round(score.cast("double"), 6).as("score"),
            (score > 0).as("predicted"),
            col("is_en").as("actual"),
            ((score > 0) === col("is_en")).as("correct"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, $wordsSql AS w FROM documents),
        -- hits computed ROW-WISE (langHitsColsSql), not via a join
        -- back on doc_id: a duplicate doc_id would fan the join out
        -- (chaos-gate divergence class) while the Spark side scores
        -- each row independently
        h AS (SELECT doc_id, w,
          $langHitsColsSql
          FROM t),
        d AS (SELECT doc_id, ($langidPredSql) = 'en' AS is_en, w FROM h),
        f AS (SELECT doc_id, is_en, (${OracleSql.foldSql("g", 31)}) % $DsirBuckets AS b
              FROM (SELECT doc_id, is_en, unnest(w) AS g FROM d)),
        c AS (SELECT b, SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS c1,
                     SUM(CASE WHEN is_en THEN 0 ELSE 1 END) AS c0
              FROM f GROUP BY 1),
        tot AS (SELECT SUM(c1) AS n1, SUM(c0) AS n0 FROM c),
        pr AS (SELECT CAST(ROUND(LN(CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) + 1 AS DOUBLE)
                     / CAST(SUM(CASE WHEN is_en THEN 0 ELSE 1 END) + 1 AS DOUBLE)), 9)
                   AS DECIMAL(18,9)) AS prior FROM d),
        lut AS (SELECT b,
                  CAST(ROUND(LN(CAST(c1 * $DsirBuckets + 1 AS DOUBLE) / CAST((n1 + 1) * $DsirBuckets AS DOUBLE))
                           - LN(CAST(c0 * $DsirBuckets + 1 AS DOUBLE) / CAST((n0 + 1) * $DsirBuckets AS DOUBLE)), 9)
                       AS DECIMAL(18,9)) AS lw
                FROM c, tot),
        s AS (SELECT doc_id, SUM(lw) AS slw, COUNT(*) AS n
              FROM f JOIN lut USING (b) GROUP BY 1)
        SELECT d.doc_id, CAST(COALESCE(n, 0) AS INTEGER) AS n_features,
          ROUND(CAST(COALESCE(slw, 0) + prior AS DOUBLE), 6) AS score,
          (COALESCE(slw, 0) + prior) > 0 AS predicted,
          is_en AS actual,
          ((COALESCE(slw, 0) + prior) > 0) = is_en AS correct
        FROM d LEFT JOIN s USING (doc_id), pr ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_contamination_ngram",
      (s, dir) => {
        // Train/eval contamination detection — the decontamination
        // step every benchmark-respecting training pipeline runs:
        // find training documents sharing word n-grams with a held-out
        // eval set (here 4-grams; eval = doc_id % 50 == 0, a stand-in
        // for a benchmark suite). Same shingle-collision equi-join
        // shape as the Jaccard dedup candidate generation, but
        // one-sided: the eval side is benchmark-sized, so it
        // BROADCASTS and the corpus-side scan never shuffles on the
        // shingle key — at 100 TB that is a map-side join over the
        // whole corpus, which is exactly how production decontam runs.
        // n_shared counts distinct shared 4-grams (both sides are
        // per-doc distinct shingle sets); >= 3 flags contamination,
        // 1-2 are reported for audit. The rule (shingling, eval
        // split, finish) is the SHARED contaminationSides/Finish
        // definition, so this rung and the Bloom rung cannot drift.
        val (ev, tr) = contaminationSides(s, dir)
        contaminationFinish(tr.join(broadcast(ev), "s"))
      },
      Some(contaminationOracleSql)
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_contamination_bloom",
      (s, dir) => {
        // The same decontamination semantics as q_contamination_ngram,
        // via the SKETCH-PRUNE + EXACT-CONFIRM rig — the shape for
        // when the eval suite outgrows an exact broadcast: a Bloom
        // filter over the eval shingles (driver-merged sketch, ~1 bit
        // x ln(1/fpp)/ln(2)^2 per item instead of the full string set)
        // prunes the corpus-side scan map-side, and only the
        // survivors reach the exact join. Bloom filters have NO false
        // negatives, so prune-then-confirm produces EXACTLY the
        // all-pairs result — the oracle is the same exact SQL, and
        // the false-positive rate only costs confirm work (bounded by
        // fpp), never correctness. The sketch build crosses the
        // driver as one merged bitset — the same scalar-precompute
        // boundary as the BM25 corpus stats, sized O(sketch) not
        // O(data). The confirm join carries NO broadcast hint: the
        // rung's premise is an eval side too big to broadcast
        // exactly, so the registered plan is the shuffle join over
        // the pruned survivors (AQE may still elect broadcast at
        // fixture scale — that's a runtime size decision, not a
        // baked-in assumption). The rule itself is the SHARED
        // contaminationSides/Finish definition and the oracle is the
        // SAME exact SQL as the plain rung — lossless by Bloom's
        // no-false-negative guarantee.
        val (ev, tr) = contaminationSides(s, dir)
        // Spark's stat.bloomFilter NPEs on an EMPTY frame (null
        // aggregation buffer) — an empty eval suite must mean "no
        // contamination", not a crashed stage, so short-circuit to
        // the schema-correct empty join (the q_text_bm25 empty-corpus
        // guard pattern). The count doubles as the sketch capacity:
        // a hardcoded capacity under-sizes the filter when the eval
        // suite grows past it, inflating the false-positive rate and
        // silently eroding the prune (correctness would survive via
        // the exact confirm join, but the rung's scaling premise
        // would not) — so the sketch is sized from the data, floored
        // so tiny suites still get a few KB of headroom.
        val nEv = ev.count()
        if (nEv == 0L) contaminationFinish(tr.join(ev, "s"))
        else {
          // 3% fpp keeps the sketch ~6KB per 10k items
          val bloom = ev.stat.bloomFilter("s", math.max(nEv, 10000L), 0.03)
          val bf = s.sparkContext.broadcast(bloom)
          val mightContain =
            udf((x: String) => x != null && bf.value.mightContainString(x))
          contaminationFinish(tr.filter(mightContain(col("s"))).join(ev, "s"))
        }
      },
      Some(contaminationOracleSql)
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_quality_gopher",
      (s, dir) => {
        // Repetition-based quality filtering (the Gopher rules family,
        // Rae et al. 2021 §A1.1; same spirit as C4's heuristics): flag
        // documents dominated by a single token, a single bigram, or
        // repeated bigrams. Signals per doc:
        //   top_unigram_frac = count(most frequent token) / n_tokens
        //   top_bigram_frac  = count(most frequent bigram) / n_bigrams
        //   dup_bigram_frac  = sum of counts of bigrams occurring >1 /
        //                      n_bigrams
        //   mean_token_len   = total chars across tokens / n_tokens
        // keep = all three repetition signals under their thresholds
        // (0.10 / 0.05 / 0.10 — tuned to split this corpus; a real
        // pipeline uses the published constants). Shape: explode ->
        // (doc, ngram) count -> per-doc aggregate. Both groupBys get
        // map-side partial aggregation, so shuffle volume is the
        // DISTINCT (doc, ngram) pairs, not the token stream — the
        // canonical distributed per-doc counting plan; keep decisions
        // compare the raw (unrounded) fractions, which are exact
        // integer-ratio doubles and therefore engine-portable.
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"), TextKit.tokens(col("text")).as("w"))
        gopherSignals(toks)
          .select(
            col("doc_id"),
            col("n").cast("int").as("n_tokens"),
            // zero-denominator guards (chaos-fixture ANSI crash class):
            // a 0-token/0-bigram doc reports NULL fractions — DuckDB's
            // x/0 is NULL naturally, ANSI Spark would throw — while
            // gopherKeep's own leading n/nb guards already short-
            // circuit it to false
            when(col("n") > 0, round(col("mxu") / col("n"), 6)).as("top_unigram_frac"),
            when(col("nb") > 0, round(col("mxb") / col("nb"), 6)).as("top_bigram_frac"),
            when(col("nb") > 0, round(col("dupb") / col("nb"), 6)).as("dup_bigram_frac"),
            when(col("n") > 0, round(col("chars") / col("n"), 6)).as("mean_token_len"),
            gopherKeep.as("keep")
          )
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, $wordsSql AS w FROM documents),
        $gopherSignalsCteSql
        SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
          ROUND(mxu / n, 6) AS top_unigram_frac,
          ROUND(mxb / nb, 6) AS top_bigram_frac,
          ROUND(dupb / nb, 6) AS dup_bigram_frac,
          ROUND(chars / n, 6) AS mean_token_len,
          $gopherKeepSql AS keep
        FROM sig ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_corpus_repeated_ngrams",
      (s, dir) => {
        // CORPUS-level repetition (vs q_quality_gopher's WITHIN-doc
        // signals): the boilerplate-detection pass of substring-level
        // dedup (Lee et al. 2021 "Deduplicating Training Data ...",
        // approximated at n-gram granularity) — count every 5-gram
        // occurrence corpus-wide, mark the ones appearing >= 2 times,
        // and score each document by the fraction of its 5-gram
        // positions covered by such repeated n-grams. Documents over
        // 0.2 are boilerplate-flagged (exact/near duplicates surface
        // at 1.0). Shape: explode NON-distinct 5-grams -> global
        // groupBy(ngram) count (partial-agg'd shuffle on the ngram
        // key — the BM25-df shape, but position-weighted) -> join the
        // counts back on the same key -> per-doc aggregate. Both
        // shuffles key on the ngram, so the plan reuses one exchange;
        // at 100 TB the count table shards with the corpus (no
        // broadcast assumption), which is exactly how suffix-array
        // approximations run at scale.
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"), TextKit.tokens(col("text")).as("w"))
        val ngrams = when(size(col("w")) < 5, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(1), size(col("w")) - 4),
            i => concat_ws(" ",
              element_at(col("w"), i), element_at(col("w"), i + 1),
              element_at(col("w"), i + 2), element_at(col("w"), i + 3),
              element_at(col("w"), i + 4))))
        val g = toks.select(col("doc_id"), explode(ngrams).as("ng"))
        val counts = g.groupBy(col("ng")).agg(count(lit(1)).as("cnt"))
        // shuffle_hash PINNED — corpus-proportional count table, the
        // side AQE must never broadcast (LmScale OOM class; rationale
        // at q_quality_lm_perplexity)
        val perDoc = g.join(counts.hint("shuffle_hash"), "ng")
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("cnt") >= 2, 1L).otherwise(0L)).as("rep"))
        // one row per doc: explode drops <5-token docs — left-join
        // back and zero-fill so they report n_ngrams=0 (frac/flag
        // NULL: no 5-grams means no repetition verdict) instead of
        // silently vanishing from the report
        toks.select(col("doc_id"))
          .join(perDoc.hint("shuffle_hash"), Seq("doc_id"), "left")
          .na.fill(0L, Seq("n", "rep"))
          .select(
            col("doc_id"),
            col("n").cast("int").as("n_ngrams"),
            col("rep").cast("int").as("n_repeated"),
            // zero-ngram guard (chaos-fixture ANSI crash class): NULL
            // frac/flag for a <5-token doc — "no 5-grams means no
            // repetition verdict" — matching DuckDB's NULL on x/0
            // (non-ANSI Spark gave NaN, whose > 0.2 is TRUE: a latent
            // cross-engine divergence, not just a crash)
            when(col("n") > 0, round(col("rep") / col("n"), 6)).as("repeated_frac"),
            when(col("n") > 0, col("rep") / col("n") > 0.2).as("boilerplate"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, $wordsSql AS w FROM documents),
        g AS (SELECT doc_id,
                unnest(list_transform(range(1, len(w) - 3),
                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS ng
              FROM t),
        c AS (SELECT ng, COUNT(*) AS cnt FROM g GROUP BY 1),
        d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS rep
              FROM g JOIN c USING (ng) GROUP BY doc_id),
        dd AS (SELECT t.doc_id, COALESCE(n, 0) AS n, COALESCE(rep, 0) AS rep
               FROM t LEFT JOIN d USING (doc_id))
        SELECT doc_id, CAST(n AS INTEGER) AS n_ngrams, CAST(rep AS INTEGER) AS n_repeated,
          ROUND(rep / n, 6) AS repeated_frac, (rep / n > 0.2) AS boilerplate
        FROM dd ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_dedup_substring_extents",
      (s, dir) => {
        // Substring-GRANULAR dedup (Lee et al. 2021 §4.1 "ExactSubstr",
        // one level finer than q_corpus_repeated_ngrams' per-doc
        // fraction): report the POSITION-AWARE maximal extents of
        // corpus-repeated text inside each document, so a cleaning
        // pass can cut the repeated spans instead of dropping whole
        // docs. Approximation contract (documented; the suffix-array
        // original is not expressible relationally): a token position
        // is "repeated" iff the 5-gram starting there occurs >= 2
        // times corpus-wide, and an extent is a maximal run of
        // consecutive repeated positions — exactly the sorted-k-gram-
        // chain reading of the suffix-array method, so an extent of
        // n_grams grams certifies a repeated substring of
        // end-start+5 tokens (any 50+-token Lee-et-al extent appears
        // here as an extent of >= 46 grams). The per-position marks
        // are THE SAME marks q_corpus_repeated_ngrams aggregates:
        // per doc, sum(n_grams) over extents == its n_repeated
        // (pinned as a cross-query property in PropertySpec).
        // Scale shape: the gram count table shards on the gram key
        // (BM25-df pattern, partial-agg'd; no broadcast assumption),
        // the join back reuses the same key, then ONE shuffle on
        // doc_id carries both the island window and — because islands
        // group by (doc_id, grp), a superset key of the window's
        // partitioning produced by a deterministic projection — the
        // extent aggregation without a further exchange. Docs with no
        // repeated positions simply list no extents (this is an
        // extent LISTING like the pair-listing dedups, not a per-doc
        // report).
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"), TextKit.tokens(col("text")).as("w"))
        val grams = when(size(col("w")) < 5,
          array().cast("array<struct<p:int,ng:string>>"))
          .otherwise(transform(
            sequence(lit(1), size(col("w")) - 4),
            i => struct(
              i.cast("int").as("p"),
              concat_ws(" ",
                element_at(col("w"), i), element_at(col("w"), i + 1),
                element_at(col("w"), i + 2), element_at(col("w"), i + 3),
                element_at(col("w"), i + 4)).as("ng"))))
        val g = toks.select(col("doc_id"), explode(grams).as("g"))
          .select(col("doc_id"), col("g.p").as("pos"), col("g.ng").as("ng"))
        // shuffle_hash PINNED: the gram-count table is corpus-
        // proportional (distinct 5-grams grow with the corpus), the
        // provably-unbounded side AQE must never broadcast (the
        // LmScale OOM class; q_quality_lm_perplexity comment has the
        // full rationale) — and without the hint AQE DID elect
        // broadcast on the fixture (observed in the r10 plan audit).
        val counts = g.groupBy(col("ng")).agg(count(lit(1)).as("cnt"))
        val repeated = g.join(counts.hint("shuffle_hash"), "ng")
          .filter(col("cnt") >= 2)
          .select(col("doc_id"), col("pos"))
        // islands trick: consecutive positions share pos - row_number
        val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        repeated
          .withColumn("grp", col("pos") - row_number().over(wDoc))
          .groupBy(col("doc_id"), col("grp"))
          .agg(
            min(col("pos")).as("start_pos"),
            max(col("pos")).as("end_pos"),
            count(lit(1)).cast("int").as("n_grams"))
          .select(
            col("doc_id"),
            col("start_pos"),
            col("end_pos"),
            col("n_grams"),
            (col("end_pos") - col("start_pos") + 5).cast("int").as("extent_tokens"))
          .orderBy("doc_id", "start_pos")
      },
      Some(s"""WITH t AS (SELECT doc_id, $wordsSql AS w FROM documents),
        g0 AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(w) - 3),
                   i -> {'p': i, 'ng': w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]})) AS s
               FROM t),
        g AS (SELECT doc_id, CAST(s.p AS INTEGER) AS pos, s.ng AS ng FROM g0),
        c AS (SELECT ng, COUNT(*) AS cnt FROM g GROUP BY 1),
        r AS (SELECT doc_id, pos FROM g JOIN c USING (ng) WHERE cnt >= 2),
        i AS (SELECT doc_id, pos,
                pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
              FROM r)
        SELECT doc_id, MIN(pos) AS start_pos, MAX(pos) AS end_pos,
          CAST(COUNT(*) AS INTEGER) AS n_grams,
          CAST(MAX(pos) - MIN(pos) + 5 AS INTEGER) AS extent_tokens
        FROM i GROUP BY doc_id, grp
        ORDER BY doc_id, start_pos""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_dedup_substring_cut",
      (s, dir) => {
        // The TRANSFORMATION half of substring dedup (Lee et al. 2021
        // actually REMOVE the repeated spans — q_dedup_substring_*
        // only report them): rebuild every document's text with all
        // corpus-repeated spans cut out. A token position t is
        // covered iff some repeated 5-gram starts in [t-4, t] —
        // i.e. the union of [p, p+4] over repeated gram positions p,
        // which needs no extent/island pass: explode each repeated
        // position into its 5 covered token slots and anti-join the
        // token stream against them (duplicate covered slots are
        // harmless to an anti join, so no distinct shuffle). The
        // surviving tokens re-assemble in position order
        // (array_sort over (pos, token) structs — one deterministic
        // per-doc fold), and the gate hash-compares the REBUILT TEXT
        // itself (md5, the PII-scrub recipe), not just counts.
        // Scale shape: gram counting shards on the gram key
        // (shuffle_hash pinned, as its sibling queries), the
        // anti-join and the rebuild both shuffle on doc_id. One row
        // per doc (house rule): an uncovered doc returns its original
        // token stream; a fully-covered (or empty/NULL-text) doc
        // reports n_kept 0 with NULL cleaned_len/md5 ("nothing
        // survived" is a policy verdict, not an empty string
        // pretending to be content).
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"), TextKit.tokens(col("text")).as("w"))
        val grams = when(size(col("w")) < 5,
          array().cast("array<struct<p:int,ng:string>>"))
          .otherwise(transform(
            sequence(lit(1), size(col("w")) - 4),
            i => struct(
              i.cast("int").as("p"),
              concat_ws(" ",
                element_at(col("w"), i), element_at(col("w"), i + 1),
                element_at(col("w"), i + 2), element_at(col("w"), i + 3),
                element_at(col("w"), i + 4)).as("ng"))))
        val g = toks.select(col("doc_id"), explode(grams).as("g"))
          .select(col("doc_id"), col("g.p").as("pos"), col("g.ng").as("ng"))
        val counts = g.groupBy(col("ng")).agg(count(lit(1)).as("cnt"))
        val covered = g.join(counts.hint("shuffle_hash"), "ng")
          .filter(col("cnt") >= 2)
          .select(col("doc_id"),
            explode(sequence(col("pos"), col("pos") + 4)).as("t"))
        val tokPos = toks
          .select(col("doc_id"), posexplode(col("w")).as(Seq("p0", "tok")))
          .select(col("doc_id"), (col("p0") + 1).as("t"), col("tok"))
        // shuffle_hash PINNED on the covered-slot side too: it is
        // corpus-proportional (5 rows per repeated gram position) and
        // the static planner elected to broadcast it on the fixture —
        // the LmScale OOM class again
        val kept = tokPos
          .join(covered.hint("shuffle_hash"), Seq("doc_id", "t"), "left_anti")
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).cast("int").as("n_kept"),
            array_join(
              transform(
                array_sort(collect_list(struct(col("t"), col("tok")))),
                x => x.getField("tok")),
              " ").as("cleaned"))
        // n_tokens must be NULL-guarded, not bare size(w): under the
        // production ANSI-off dialect size(NULL) is -1 (legacy
        // sizeOfNull) while the oracle's len(w) is NULL — a NULL-text
        // document would diverge in exactly the dialect the clean gate
        // runs (advisor r10; masked until now because NULL-text docs
        // only appeared under SPARK_GRAFT_ANSI=true, where size(NULL)
        // IS NULL).
        toks
          .select(col("doc_id"),
            when(col("w").isNotNull, size(col("w"))).as("n_tokens"))
          .join(kept.hint("shuffle_hash"), Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            col("n_tokens"),
            coalesce(col("n_kept"), lit(0)).as("n_kept"),
            (col("n_tokens") - coalesce(col("n_kept"), lit(0))).as("n_removed"),
            length(col("cleaned")).as("cleaned_len"),
            md5(col("cleaned").cast("binary")).as("cleaned_md5"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, $wordsSql AS w FROM documents),
        g0 AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(w) - 3),
                   i -> {'p': i, 'ng': w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]})) AS s
               FROM t),
        g AS (SELECT doc_id, CAST(s.p AS INTEGER) AS pos, s.ng AS ng FROM g0),
        c AS (SELECT ng, COUNT(*) AS cnt FROM g GROUP BY 1),
        cov AS (SELECT doc_id, unnest(range(pos, pos + 5)) AS tt
                FROM g JOIN c USING (ng) WHERE cnt >= 2),
        tp0 AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(w) + 1),
                    i -> {'t': i, 'tok': w[i]})) AS s
                FROM t),
        tp AS (SELECT doc_id, CAST(s.t AS INTEGER) AS t, s.tok AS tok FROM tp0),
        kept AS (SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_kept,
                   string_agg(tok, ' ' ORDER BY t, tok) AS cleaned
                 FROM tp
                 WHERE NOT EXISTS (SELECT 1 FROM cov
                                   WHERE cov.doc_id = tp.doc_id AND cov.tt = tp.t)
                 GROUP BY doc_id)
        SELECT t.doc_id, CAST(len(w) AS INTEGER) AS n_tokens,
          COALESCE(n_kept, 0) AS n_kept,
          CAST(len(w) AS INTEGER) - COALESCE(n_kept, 0) AS n_removed,
          CAST(length(cleaned) AS INTEGER) AS cleaned_len,
          md5(cleaned) AS cleaned_md5
        FROM t LEFT JOIN kept USING (doc_id)
        ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_quality_lm_perplexity",
      (s, dir) => {
        // CCNet-style LM quality filtering (Wenzek et al. 2020 §4.3:
        // score documents by language-model perplexity, keep the
        // low-perplexity head) with the LM trained on the corpus
        // itself: an add-one-smoothed bigram model,
        //   P(w2|w1) = (c(w1,w2) + 1) / (c(w1,*) + V),
        // per-doc perplexity = exp(-mean ln P) over the doc's bigram
        // positions. Complements q_quality_gopher (rule-based, within-
        // doc) with a statistical, corpus-calibrated signal — the
        // third member of the quality family, and unlike Gopher it
        // penalizes UNUSUAL text (rare transitions), not repeated
        // text. Scale shape: explode non-distinct bigrams -> global
        // groupBy((w1,w2)) count (partial-agg'd shuffle, the BM25-df /
        // repeated-ngrams pattern) -> c(w1,*) via a window over the
        // COUNT table (vocab-sized, not corpus-sized) -> join counts
        // back on the bigram key (same-key exchange reuse, AQE handles
        // skewed stopword bigrams) -> per-doc aggregate. V folds in as
        // a 1-row broadcast crossJoin (the llrCells plan-native scalar
        // pattern). DETERMINISM: each ln is rounded to 9dp and cast to
        // DECIMAL(18,9) before the per-doc SUM, so the fold is exact
        // and order-free (the ColumnKit money recipe applied to
        // log-space); one double division + exp at the end, rounded to
        // 6dp (the llr recipe — absorbs the <=1-ulp libm/JVM ln
        // disagreement). Every doc reports one row (degenerate-docs
        // house rule): <2 tokens or NULL text -> n_bigrams=0, ppl
        // NULL, keep=false.
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"), TextKit.tokens(col("text")).as("w"))
        val pairs = when(size(col("w")) < 2,
          array().cast("array<struct<w1:string,w2:string>>"))
          .otherwise(transform(
            sequence(lit(1), size(col("w")) - 1),
            i => struct(
              element_at(col("w"), i).as("w1"),
              element_at(col("w"), i + 1).as("w2"))))
        val bg = toks.select(col("doc_id"), explode(pairs).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
        val counts = c2.withColumn(
          "c1", sum(col("c2")).over(Window.partitionBy(col("w1"))))
        val vdf = toks.select(explode(col("w")).as("t"))
          .agg(count_distinct(col("t")).as("V"))
        // shuffle_hash PINNED on both corpus-proportional joins: the
        // count table is vocab^2-shaped (corpus-dependent, provably
        // unbounded — the inverse of the BPE-LUT case, where a bounded
        // vocab let AQE elect), and AQE's compressed-shuffle-bytes
        // threshold underestimates the in-memory hash relation for
        // string-heavy aggregates ~10x: at 2M docs (tools.LmScale) AQE
        // elected broadcast and the driver OOMed at blockify. The hint
        // forbids that conversion while keeping a per-partition hash
        // build (counts keys are UNIQUE, so build partitions stay
        // balanced at 1/P of the table — no sort of the 20x-larger
        // bigram stream, which is what a merge pin would cost).
        val scored = bg
          .join(counts.hint("shuffle_hash"), Seq("w1", "w2"))
          .crossJoin(broadcast(vdf))
          .select(
            col("doc_id"),
            round(
              log((col("c2") + 1).cast("double") / (col("c1") + col("V")).cast("double")),
              9).cast("decimal(18,9)").as("lp"))
          .groupBy(col("doc_id"))
          .agg(sum(col("lp")).as("slp"), count(lit(1)).as("nb"))
          .select(
            col("doc_id"),
            col("nb"),
            round(exp(-(col("slp").cast("double") / col("nb"))), 6).as("ppl"))
        toks.select(col("doc_id"))
          .join(scored.hint("shuffle_hash"), Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            coalesce(col("nb"), lit(0L)).cast("int").as("n_bigrams"),
            col("ppl"),
            (col("ppl").isNotNull && col("ppl") <= LmPerplexityKeepMax).as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, $wordsSql AS w FROM documents),
        g AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
                i -> {'w1': w[i], 'w2': w[i+1]})) AS b FROM t),
        bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM g),
        c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
        c AS (SELECT w1, w2, c2, SUM(c2) OVER (PARTITION BY w1) AS c1 FROM c2),
        v AS (SELECT COUNT(DISTINCT tk) AS V FROM (SELECT unnest(w) AS tk FROM t)),
        lp AS (SELECT doc_id,
                 CAST(ROUND(LN(CAST(c2 + 1 AS DOUBLE) / CAST(c1 + V AS DOUBLE)), 9)
                      AS DECIMAL(18,9)) AS lp
               FROM bg JOIN c USING (w1, w2), v),
        agg AS (SELECT doc_id, SUM(lp) AS slp, COUNT(*) AS nb FROM lp GROUP BY 1),
        r AS (SELECT t.doc_id, COALESCE(nb, 0) AS nb,
                     ROUND(EXP(-(CAST(slp AS DOUBLE) / nb)), 6) AS ppl
              FROM t LEFT JOIN agg USING (doc_id))
        SELECT doc_id, CAST(nb AS INTEGER) AS n_bigrams, ppl,
               COALESCE(ppl <= $LmPerplexityKeepMax, FALSE) AS keep
        FROM r ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_text_bpe_tokenize",
      (s, dir) => {
        // REAL BPE subword tokenization (Sennrich et al. 2016 — both
        // halves: functions.Bpe trains 30 merges over the corpus's
        // fixed vocabulary, then the standard iterative merge-apply
        // encodes every token), upgrading q_text_stats' regex
        // pre-tokenizer count to the actual algorithm a training
        // pipeline budgets tokens with. Scale shape: the encode UDF
        // (inherently sequential per word — the honest §2.10 rung)
        // runs once per DISTINCT token, and the resulting
        // (token -> piece count) table joins back to the exploded
        // stream — the expensive-function-on-distinct-keys pattern,
        // so UDF invocations scale with vocabulary size, not corpus
        // size. The join-back carries NO broadcast hint: web-scale
        // text has an effectively unbounded distinct-token set (URLs,
        // typos, numbers), so a hard hint on the LUT is a driver OOM
        // at 100x — AQE elects broadcast at runtime when the LUT is
        // actually small (it is here; verified in the fixture plan)
        // and falls back to a shuffled hash join when it isn't, the
        // same reasoning as the Bloom confirm join below. Oracle: the
        // vocabulary is finite and fixed, so the merge table's OUTPUT
        // is replayed as a DuckDB LUT (the Stemmer trick);
        // out-of-vocabulary tokens take the BYTE FALLBACK
        // (Bpe.encodeWithByteFallback — the sentencepiece
        // byte_fallback / GPT-2 byte-alphabet convention): one piece
        // per UTF-8 byte plus the end-of-word mark, so emoji/CJK/
        // unseen-ASCII tokens encode deterministically through a
        // finite 256-symbol alphabet and the oracle replays them in
        // closed form as strlen(tok) + 1 (DuckDB strlen = UTF-8 byte
        // length). Total coverage, no UNK, exact cross-engine
        // agreement on ANY token — this converted the r11 chaos gate's
        // documented OOV divergence into genuine agreement.
        val rk = graft.functions.Bpe.ranks(bpeMerges)
        val vocabSet = bpeVocab.toSet
        val nPieces = udf((tok: String) =>
          if (tok == null) 0
          else graft.functions.Bpe.encodeWithByteFallback(tok, vocabSet, rk).length)
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"), explode(TextKit.tokens(col("text"))).as("tok"))
        val lut = toks.select(col("tok")).distinct()
          .withColumn("np", nPieces(col("tok")))
        toks.join(lut, "tok")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n"), sum(col("np")).as("p"))
          .select(
            col("doc_id"),
            col("n").cast("int").as("n_tokens"),
            col("p").cast("int").as("n_pieces"),
            round(col("p") / col("n"), 6).as("pieces_per_token"))
          .orderBy("doc_id")
      },
      Some {
        // The oracle replays the encoder driver-side over bpeVocab at
        // query-REGISTRATION time and inlines one VALUES row per word
        // — sound only while the vocabulary stays LUT-sized. This
        // guard keeps a future vocabulary change from silently
        // ballooning the SQL text (or the registration-time encode
        // cost) past what a VALUES-list oracle can carry.
        require(bpeVocab.size <= 4096,
          s"bpeVocab has ${bpeVocab.size} entries — too large to replay as a " +
            "VALUES-list oracle; regenerate the oracle strategy before growing it")
        val rk = graft.functions.Bpe.ranks(bpeMerges)
        val lut = bpeVocab
          .map(w => s"('$w', ${graft.functions.Bpe.encode(w, rk).length})")
          .mkString(", ")
        s"""WITH lut(tok, np) AS (VALUES $lut),
           |t AS (SELECT doc_id, $wordsSql AS w FROM documents),
           |u AS (SELECT doc_id, unnest(w) AS tok FROM t),
           |j AS (SELECT doc_id, COALESCE(l.np, strlen(tok) + 1) AS np
           |      FROM u LEFT JOIN lut l USING (tok)),
           |d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(np) AS BIGINT) AS p
           |      FROM j GROUP BY 1)
           |SELECT doc_id, CAST(n AS INTEGER) AS n_tokens, CAST(p AS INTEGER) AS n_pieces,
           |  ROUND(p / n, 6) AS pieces_per_token
           |FROM d ORDER BY doc_id""".stripMargin
      }
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_text_pii_scrub",
      (s, dir) => {
        // PII redaction (the C4-style cleaning pass): regex-scrub
        // emails and phone numbers, report per-doc match counts and
        // the scrubbed fingerprint. The fixture corpus carries no PII,
        // so — the Media-container pattern applied to text — each doc
        // is AUGMENTED with deterministic synthetic PII (doc_id % 3
        // emails, doc_id % 2 phone numbers) that the oracle rebuilds
        // from the same formulas; what the gate checks is the REGEX
        // ENGINE AGREEMENT: both engines must find the same matches
        // and produce byte-identical scrubbed text (md5-compared).
        // The patterns carry RFC-sized quantifier BOUNDS — without
        // them Java's backtracking engine goes quadratic on hostile
        // class-char runs (TextKit.EmailRe scaladoc; sweep:
        // AdversarialRegexSpec). Embarrassingly parallel projection —
        // no shuffle, the scan's natural partitioning carries it,
        // which is why scrub passes at 100 TB are the cheap part of a
        // pipeline.
        val emailRe = TextKit.EmailRe
        val phoneRe = TextKit.PhoneRe
        Tables(s, dir, "documents")
          .withColumn("email_blk",
            concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.org")))
          .withColumn("phone_blk",
            concat(lit(" call +1-555-"), lpad(col("doc_id").cast("string"), 4, "0")))
          .withColumn("aug", concat(col("text"),
            expr("repeat(email_blk, CAST(doc_id % 3 AS INT))"),
            expr("repeat(phone_blk, CAST(doc_id % 2 AS INT))")))
          .withColumn("scrubbed",
            regexp_replace(regexp_replace(col("aug"), emailRe, "<EMAIL>"), phoneRe, "<PHONE>"))
          .select(
            col("doc_id"),
            regexp_count(col("aug"), lit(emailRe)).as("n_emails"),
            regexp_count(col("aug"), lit(phoneRe)).as("n_phones"),
            length(col("scrubbed")).as("scrubbed_len"),
            md5(col("scrubbed").cast("binary")).as("scrubbed_md5"))
          .orderBy("doc_id")
      },
      Some(s"""WITH a AS (
          SELECT doc_id,
            text || repeat(' contact user' || CAST(doc_id AS VARCHAR) || '@example.org',
                           CAST(doc_id % 3 AS INTEGER))
                 || repeat(' call +1-555-' || lpad(CAST(doc_id AS VARCHAR), 4, '0'),
                           CAST(doc_id % 2 AS INTEGER)) AS aug
          FROM documents),
        sc AS (
          SELECT doc_id, aug,
            regexp_replace(regexp_replace(aug, '${TextKit.EmailRe}', '<EMAIL>', 'g'),
                           '${TextKit.PhoneRe}', '<PHONE>', 'g') AS scrubbed
          FROM a)
        SELECT doc_id,
          CAST(len(regexp_extract_all(aug, '${TextKit.EmailRe}')) AS INTEGER) AS n_emails,
          CAST(len(regexp_extract_all(aug, '${TextKit.PhoneRe}')) AS INTEGER) AS n_phones,
          CAST(length(scrubbed) AS INTEGER) AS scrubbed_len,
          md5(scrubbed) AS scrubbed_md5
        FROM sc ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_text_bpe_train",
      (s, dir) => {
        // Distributed BPE-MERGE TRAINING (the learning half of the
        // tokenizer family — q_text_bpe_tokenize ENCODES with a given
        // merge table; this rung LEARNS one): three merge rounds over
        // the corpus, each = a distributed adjacent-pair count
        // (explode + groupBy, map-side combined), a deterministic
        // argmax (count desc, pair asc — a one-row collect), and a
        // corpus-wide GREEDY merge application. Sequences ride a
        // boundary-safe encoding — symbols joined by a DOUBLE
        // separator, the merge pattern borrowing one separator from
        // each side — so `replace` (left-to-right, non-overlapping,
        // identical semantics in Spark and DuckDB) merges EVERY
        // non-overlapping occurrence without ever matching across a
        // symbol boundary, and self-pairs (l = r) merge greedily
        // left-to-right exactly like real BPE. The alphabet is
        // sanitized to [a-z] (first 200 chars/doc) so char splitting,
        // lowercasing, and byte order agree across engines. The
        // oracle replays all three rounds in closed-form SQL —
        // LEFT JOIN + COALESCE keeps a pairless round a no-op on both
        // sides. Output: the learned merges with their counts plus
        // the final corpus symbol count.
        import org.apache.spark.sql.Row
        import graft.functions.BpeTrain
        val docs = Tables(s, dir, "documents").filter(col("text").isNotNull)
        val schema0 = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("round",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("left_sym",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("right_sym",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType)))
        // empty corpus (or all-null text): no merges, no TOTAL row —
        // the all-empty-dataset sweep contract, mirrored by the
        // oracle's EXISTS guard
        if (docs.isEmpty)
          s.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema0)
        else {
          val (merges, finalCorpus) =
            BpeTrain.learnMerges(docs, "text", rounds = 3, capChars = 200)
          val totalRow = finalCorpus
            .agg(sum(size(BpeTrain.syms(col("s"))))).head()
          val total: java.lang.Long = if (totalRow.isNullAt(0)) null else totalRow.getLong(0)
          val rows = merges.map { case (round, l, r, c) => Row(round, l, r, c) } :+
            Row(4, "TOTAL", "SYMBOLS", total)
          import scala.jdk.CollectionConverters._
          s.createDataFrame(rows.asJava, schema0).orderBy("round")
        }
      },
      Some(raw"""WITH docs0 AS (
          SELECT concat(regexp_replace(
                   substr(regexp_replace(lower(text), '[^a-z]', '', 'g'), 1, 200),
                   '(.)', chr(31)||chr(31)||'\1', 'g'), chr(31)||chr(31)) AS s
          FROM documents WHERE text IS NOT NULL),
        pr1 AS (SELECT a[i] AS l, a[i+1] AS r
          FROM (SELECT list_filter(string_split(s, chr(31)||chr(31)), t -> t != '') AS a
                FROM docs0), UNNEST(range(1, len(a))) AS t(i)),
        m1 AS (SELECT l, r, c FROM (SELECT l, r, COUNT(*) AS c FROM pr1
                GROUP BY 1, 2 ORDER BY c DESC, l, r LIMIT 1)),
        docs1 AS (SELECT COALESCE(replace(s, chr(31)||l||chr(31)||chr(31)||r||chr(31),
                                             chr(31)||l||r||chr(31)), s) AS s
                  FROM docs0 LEFT JOIN m1 ON TRUE),
        pr2 AS (SELECT a[i] AS l, a[i+1] AS r
          FROM (SELECT list_filter(string_split(s, chr(31)||chr(31)), t -> t != '') AS a
                FROM docs1), UNNEST(range(1, len(a))) AS t(i)),
        m2 AS (SELECT l, r, c FROM (SELECT l, r, COUNT(*) AS c FROM pr2
                GROUP BY 1, 2 ORDER BY c DESC, l, r LIMIT 1)),
        docs2 AS (SELECT COALESCE(replace(s, chr(31)||l||chr(31)||chr(31)||r||chr(31),
                                             chr(31)||l||r||chr(31)), s) AS s
                  FROM docs1 LEFT JOIN m2 ON TRUE),
        pr3 AS (SELECT a[i] AS l, a[i+1] AS r
          FROM (SELECT list_filter(string_split(s, chr(31)||chr(31)), t -> t != '') AS a
                FROM docs2), UNNEST(range(1, len(a))) AS t(i)),
        m3 AS (SELECT l, r, c FROM (SELECT l, r, COUNT(*) AS c FROM pr3
                GROUP BY 1, 2 ORDER BY c DESC, l, r LIMIT 1)),
        docs3 AS (SELECT COALESCE(replace(s, chr(31)||l||chr(31)||chr(31)||r||chr(31),
                                             chr(31)||l||r||chr(31)), s) AS s
                  FROM docs2 LEFT JOIN m3 ON TRUE)
        SELECT CAST(1 AS INTEGER) AS round, l AS left_sym, r AS right_sym,
               CAST(c AS BIGINT) AS n FROM m1
        UNION ALL
        SELECT CAST(2 AS INTEGER), l, r, CAST(c AS BIGINT) FROM m2
        UNION ALL
        SELECT CAST(3 AS INTEGER), l, r, CAST(c AS BIGINT) FROM m3
        UNION ALL
        SELECT CAST(4 AS INTEGER), 'TOTAL', 'SYMBOLS',
          CAST((SELECT SUM(len(list_filter(string_split(s, chr(31)||chr(31)),
                                           t -> t != ''))) FROM docs3) AS BIGINT)
        WHERE EXISTS (SELECT 1 FROM docs0)
        ORDER BY round""")
    )
  )
}
