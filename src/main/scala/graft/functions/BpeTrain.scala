package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE-merge TRAINING — the learning half of the tokenizer
  * family ([[Bpe]] encodes with a given merge table; this learns one).
  * Each round is one corpus pass: a distributed adjacent-pair count
  * (explode + map-side-combined groupBy), a deterministic argmax
  * (count desc, pair asc — a one-row collect), and a corpus-wide
  * GREEDY merge application as a narrow map. At 100 TB a round is
  * exactly one shuffle (the pair count) plus one mapper (the merge) —
  * the shape real distributed BPE trainers use; the merge table is
  * driver-side metadata (a few rows per round).
  *
  * BOUNDARY-SAFE sequence encoding: symbols are joined by a DOUBLE
  * separator and the whole string is wrapped in one, so a merge
  * pattern of the form `sep l sep sep r sep` (borrowing one separator
  * from each side) can never match ACROSS a symbol boundary — the
  * naive single-separator encoding merges (h,e) inside a
  * previously-merged "th|e" — while plain `replace` (left-to-right,
  * non-overlapping — identical semantics in Spark, DuckDB, and POSIX
  * string scan) merges every non-overlapping occurrence and collapses
  * self-pairs (l = r) greedily exactly like real BPE ("aaa" with the
  * (a,a) merge becomes [aa, a]).
  *
  * The alphabet is sanitized to [a-z] and each document capped at
  * `capChars` so char splitting, lowercasing, and byte order agree
  * across engines — which is what makes the training exactly
  * replayable by the DuckDB oracle (q_text_bpe_train).
  */
object BpeTrain {

  val Sep = "\u001F" // chr(31) on the oracle side
  val Sep2: String = Sep + Sep

  /** Symbols of an encoded sequence column. */
  def syms(c: Column): Column = filter(split(c, Sep2), x => x =!= "")

  /** Sanitize + encode `textCol` into the boundary-safe symbol string. */
  def encode(textCol: Column, capChars: Int): Column =
    concat(
      regexp_replace(
        substring(regexp_replace(lower(textCol), "[^a-z]", ""), 1, capChars),
        "(.)", Sep2 + "$1"),
      lit(Sep2))

  /** One round's adjacent-pair frame (columns l, r) over encoded `s`. */
  def pairs(encoded: DataFrame): DataFrame = encoded
    .select(syms(col("s")).as("a"))
    .filter(size(col("a")) >= 2)
    .select(explode(zip_with(
      slice(col("a"), lit(1), size(col("a")) - 1),
      slice(col("a"), lit(2), size(col("a")) - 1),
      (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
    .select(col("p.l").as("l"), col("p.r").as("r"))

  /** Learn up to `rounds` merges over `docs(textCol)`; returns the
    * merge table (round, left, right, count) and the final encoded
    * corpus (column `s`) for downstream stats. Stops early when a
    * round finds no pair.
    */
  def learnMerges(
      docs: DataFrame,
      textCol: String,
      rounds: Int,
      capChars: Int = 200
  ): (Seq[(Int, String, String, Long)], DataFrame) = {
    var cur = docs
      .filter(col(textCol).isNotNull)
      .select(encode(col(textCol), capChars).as("s"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (round <- 1 to rounds) {
      val top = pairs(cur)
        .groupBy("l", "r").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      top.foreach { t =>
        val (l, r, c) = (t.getString(0), t.getString(1), t.getLong(2))
        merges += ((round, l, r, c))
        cur = cur.select(call_function("replace", col("s"),
            lit(Sep + l + Sep2 + r + Sep), lit(Sep + l + r + Sep)).as("s"))
          .localCheckpoint()
      }
    }
    (merges.toSeq, cur)
  }
}
