package graft.functions

/** Byte-pair encoding, both halves (Sennrich et al. 2016): a greedy
  * pair-count TRAINER and the standard iterative merge APPLY. Pure
  * deterministic Scala — merge ranks come from training, ties broken
  * lexicographically, so the (word -> pieces) function is a constant
  * of the operator definition and any engine can replay its output
  * (the Stemmer LUT-oracle pattern).
  *
  * Reference analogue: the reference's NLP chain tokenizes and
  * normalizes (Helpers.scala) but has no subword stage; this is part
  * of the beyond-reference training-data surface (token counting for
  * batch/packing budgets).
  */
object Bpe {

  /** End-of-word marker (classic BPE: distinguishes "ta" mid-word from
    * "ta" word-final, and makes decode unambiguous).
    */
  val Eow = "</w>"

  /** Train `numMerges` merges over a weighted word list: repeatedly
    * merge the most frequent adjacent symbol pair (ties: lexicographic
    * on the pair), exactly the Sennrich learn_bpe loop. Deterministic:
    * input order never matters because counting is by-value and the
    * tie-break is total.
    */
  def train(words: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var corpus: Map[Vector[String], Long] = words
      .groupBy(w => symbols(w._1))
      .map { case (syms, ws) => syms -> ws.map(_._2).sum }
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      corpus.foreach { case (syms, n) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        corpus = corpus.map { case (syms, n) => mergePair(syms, best) -> n }
        i += 1
      }
    }
    merges.result()
  }

  /** Initial symbol sequence of a word: characters + end-of-word mark. */
  private def symbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ Eow

  private def mergePair(syms: Vector[String], p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == p._1 && syms(j + 1) == p._2) {
        out += syms(j) + syms(j + 1)
        j += 2
      } else {
        out += syms(j)
        j += 1
      }
    }
    out.result()
  }

  /** Apply trained merges to one word: repeatedly merge the
    * LOWEST-RANK (earliest-learned) applicable pair — the standard
    * encode loop. O(len * merges) worst case; words are short.
    */
  def encode(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = symbols(word)
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(j), syms(j + 1)) }
        j += 1
      }
      if (best == null) continue = false
      else {
        syms = mergePair(syms, best)
        if (syms.length < 2) continue = false
      }
    }
    syms
  }

  def ranks(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Byte-fallback piece for one UTF-8 byte — the sentencepiece
    * `byte_fallback` / GPT-2 byte-alphabet convention: a 256-entry
    * closed alphabet no real text can escape, rendered `<0xHH>` so a
    * fallback piece can never collide with a learned merge symbol.
    */
  def bytePiece(b: Byte): String = f"<0x${b & 0xff}%02X>"

  /** Vocabulary-closed encode with byte fallback (sentencepiece
    * `byte_fallback=true`; Kudo & Richardson 2018): words in the
    * trained vocabulary encode through the learned merge
    * decomposition; ANY other word — unseen ASCII, emoji, CJK,
    * combining marks — decomposes deterministically into the finite
    * 256-byte alphabet (one piece per UTF-8 byte, plus the
    * end-of-word mark). Total and exactly replayable by any engine:
    * piece count is LUT(word) for the closed vocabulary, UTF-8 byte
    * count + 1 for everything else — no UNK token, no value that
    * depends on replaying the merge loop over an unbounded token
    * space.
    */
  def encodeWithByteFallback(
      word: String,
      vocab: Set[String],
      ranks: Map[(String, String), Int]): Seq[String] =
    if (vocab.contains(word)) encode(word, ranks)
    else word.getBytes("UTF-8").toSeq.map(bytePiece) :+ Eow
}
