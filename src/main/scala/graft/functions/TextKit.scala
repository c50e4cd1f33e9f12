package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column kit for the LLM-data-pipeline operators
  * (tokenization, shingling, portable hashing, fingerprints).
  *
  * Everything is built from codegen'd higher-order array functions —
  * no UDFs — so the hot path stays inside whole-stage codegen and the
  * same math is expressible in ANSI-ish SQL for the DuckDB oracle.
  *
  * The reference's closest analogue is the Spark-NLP tokenizer chain
  * (literature/Grounding.scala:41-104), which we re-express natively
  * per SURVEY.md §7.3.
  */
object TextKit {

  /** Mersenne prime 2^31-1: all polynomial hashes are mod this, so
    * (acc*31 + code) stays well inside Long.
    */
  val HashP = 2147483647L

  /** Whitespace tokenization with empty-token cleanup. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => w =!= "")

  /** PII scrub patterns, shared verbatim by the Spark query and its
    * DuckDB oracle (q_text_pii_scrub) and by AdversarialRegexSpec.
    *
    * The quantifiers are BOUNDED — RFC 5321's own limits (local part
    * <= 64 octets, domain label <= 63) — and that bound is what makes
    * the scrub safe on hostile text: with an unbounded `+`, a document
    * that is one long run of class characters with no `@` makes Java's
    * backtracking engine re-consume the rest of the run from every
    * start position — O(run^2); measured 20 s on an 80 KB bait doc,
    * i.e. a stage-killer at 100 TB. With `{1,64}` the per-start cost
    * is capped at the bound, so the whole scan is O(64*n) — measured
    * 0.06 s on the same doc. DuckDB's RE2 is linear either way (no
    * backtracking), so only match AGREEMENT needs checking there: both
    * engines are leftmost-greedy, so for an over-long local part both
    * match the trailing 64 chars (pinned in AdversarialRegexSpec and
    * by the chaos-gate bait doc). No lookarounds: RE2 has none.
    */
  val EmailRe = "[a-z0-9._]{1,64}@[a-z]{1,63}\\.[a-z]{1,63}"

  /** Literal-prefixed and bounded: linear in every engine. */
  val PhoneRe = "\\+1-555-[0-9]{4}"

  /** Word n-gram shingles (space-joined), distinct. The slice/sequence
    * form stays codegen'd. Inputs shorter than n yield an EMPTY array
    * (no caller-side guard needed); a NULL input stays NULL, matching
    * the DuckDB mirrors' null propagation. NB: pass a materialized
    * column, not a token EXPRESSION — the per-position lambda
    * re-evaluates its input per shingle (see the contamination-query
    * O(len^2) fix).
    */
  def shingles(words: Column, n: Int): Column =
    // guard: below n tokens there are no shingles — without it
    // sequence(0, size-n) DESCENDS into negatives and slice(_, 0, n)
    // throws at runtime (array indices are 1-based). The DuckDB
    // mirrors' range() is empty in that regime; this matches it.
    // Chained when without otherwise: null input -> null output.
    when(
      size(words) >= n,
      array_distinct(
        transform(
          sequence(lit(0), size(words) - n),
          i => concat_ws(" ", slice(words, i + 1, lit(n)))
        )
      )
    ).when(words.isNotNull, array().cast("array<string>"))

  /** Engine-portable polynomial string hash:
    * fold(chars)(acc = (acc*mult + codepoint) mod P). DuckDB mirror:
    * list_reduce(list_prepend(0, [unicode(ch) ...]), (a,c) -> (a*mult+c) % P).
    */
  def charHash(s: Column, mult: Int = 31): Column =
    graft.plans.GraftExtensions.charHash(s, mult, HashP)

  /** The higher-order formulation charHash replaced (plans.CharHash is
    * the codegen'd twin): split-per-char + interpreted fold. Kept as
    * the independent reference implementation the PropertySpec
    * equality check runs against — the two formulations must stay
    * bit-identical on any input.
    */
  def charHashHof(s: Column, mult: Int = 31): Column =
    aggregate(
      filter(split(s, ""), ch => ch =!= ""),
      lit(0L),
      (acc, ch) => pmod(acc * mult + ascii(ch), lit(HashP))
    )

  /** 62-bit portable hash: two independent 31-bit polynomial hashes
    * packed as h31a * 2^31 + h31b (a single 62-bit fold would overflow
    * Long in the multiply step).
    */
  def charHash62(s: Column): Column =
    charHash(s, 31) * lit(2147483648L) + charHash(s, 37)

  /** One seeded affine re-hash family over a base hash, used for
    * MinHash permutations: h_i(x) = (a_i * x + b_i) mod P with odd a_i
    * derived from the golden-ratio multiplier. Deterministic in i.
    */
  def permuteHash(base: Column, a: Long, b: Long): Column =
    pmod(lit(a) * base + lit(b), lit(HashP))

  /** Deterministic per-permutation coefficients (splitmix-style
    * constants; any fixed odd multipliers work — these only need to be
    * stable across runs and documented).
    */
  def permCoefficients(numPerms: Int): (Array[Long], Array[Long]) = {
    val golden = 0x9e3779b97f4a7c15L
    val a = Array.tabulate(numPerms)(i => (((i + 1) * golden) >>> 33) | 1L)
    val b = Array.tabulate(numPerms)(i => ((i + 17) * 0xbf58476d1ce4e5b9L) >>> 33)
    (a.map(_ % HashP), b.map(_ % HashP))
  }

  /** MinHash signature (array of numPerms longs) from an array of
    * base-hash values. Single pass over the collected hash array —
    * one shuffle per document set, no row blowup.
    */
  def minhashSignature(hashes: Column, numPerms: Int): Column = {
    val (a, b) = permCoefficients(numPerms)
    val aCol = typedLit(a.toSeq)
    val bCol = typedLit(b.toSeq)
    transform(
      sequence(lit(0), lit(numPerms - 1)),
      i =>
        array_min(
          transform(
            hashes,
            h => pmod(element_at(aCol, i + 1) * h + element_at(bCol, i + 1), lit(HashP))
          )
        )
    )
  }

  /** JIT-compiled shingling kernel: same output as `shingles` (distinct
    * space-joined n-grams; empty below n tokens, NULL in -> NULL out)
    * but as one compiled pass per document instead of per-element
    * interpreted slice/concat expressions — this is the dominant cost
    * of the text-dedup queries' scan stage.
    */
  def shinglesKernel(n: Int): Column => Column = {
    val f = udf { (w: Seq[String]) =>
      if (w == null) null
      else if (w.length < n) Array.empty[String]
      else {
        val seen = new java.util.LinkedHashSet[String]
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i <= w.length - n) {
          sb.setLength(0)
          var k = 0
          while (k < n) {
            if (k > 0) sb.append(' ')
            sb.append(w(i + k))
            k += 1
          }
          seen.add(sb.toString)
          i += 1
        }
        seen.toArray(new Array[String](seen.size))
      }
    }
    w => f(w)
  }

  /** MinHash signature + LSH band keys in one JIT-compiled pass: the
    * pure-column minhashSignature/bandKeys pair evaluates
    * numPerms x |shingles| interpreted expressions per document, while
    * this UDF runs the same math as primitive long loops (~50x less
    * per-element overhead). Returns the band-key array; pair it with
    * posexplode so the band index is part of the join key.
    */
  def minhashBands(numPerms: Int, rowsPerBand: Int): Column => Column = {
    val (a, b) = permCoefficients(numPerms)
    val bands = numPerms / rowsPerBand
    val f = udf { (hs: Seq[Long]) =>
      val sig = new Array[Long](numPerms)
      var i = 0
      while (i < numPerms) {
        var m = Long.MaxValue
        val it = hs.iterator
        while (it.hasNext) {
          val v = (a(i) * it.next() + b(i)) % HashP
          if (v < m) m = v
        }
        sig(i) = m
        i += 1
      }
      val out = new Array[Long](bands)
      var j = 0
      while (j < bands) {
        var acc = 1125899906842597L
        var k = 0
        while (k < rowsPerBand) { acc = acc * 31 + sig(j * rowsPerBand + k); k += 1 }
        out(j) = acc
        j += 1
      }
      out
    }
    hs => f(hs)
  }

  /** Sorted-merge intersection size of two pre-sorted string arrays.
    * A scalar UDF is the pragmatic choice here (SURVEY.md §2.10):
    * higher-order array expressions are interpreted per element, while
    * this merge JIT-compiles; a custom codegen Expression would be the
    * next rung if this ever shows in a profile.
    */
  val sortedIntersectCount: (Column, Column) => Column = {
    val f = udf { (a: Seq[String], b: Seq[String]) =>
      var i = 0; var j = 0; var n = 0
      while (i < a.length && j < b.length) {
        val c = a(i).compareTo(b(j))
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
      n
    }
    (x, y) => f(x, y)
  }

  /** LSH band keys from a signature: rows-per-band consecutive values
    * hashed together; a pair agreeing on any band is a candidate.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      j => hash(lit(1), j, slice(sig, j * rowsPerBand + 1, lit(rowsPerBand)))
    )

  // ------------------------------------------------------------------
  // Content-defined chunking (CDC — the rolling-hash boundary rule of
  // storage dedup systems, Muthitacharoen et al. 2001 LBFS): a chunk
  // boundary falls AFTER position i whenever the polynomial hash of
  // the w-char window ending at i is ≡ 0 mod `divisor`. Because the
  // rule looks only at local content, an insertion or deletion shifts
  // the boundaries AFTER it by exactly the edit length and leaves
  // their chunks byte-identical — fixed-size chunking loses ALL
  // alignment at the first edit; CDC loses at most one chunk. The
  // boundary test reuses [[charHash]] (the codegen'd fold both engines
  // replay exactly), so a DuckDB oracle can recompute every boundary
  // and chunk hash in closed form. Production CDC adds min/max chunk
  // clamps; the pure rule here is the content-defined property itself
  // and keeps both engines' replay stateless per position.
  // ------------------------------------------------------------------

  /** Boundary END positions (1-based, ascending) of `text` under the
    * (w, divisor) CDC rule: i in [w, len] with
    * charHash(text[i-w+1 .. i]) % divisor == 0. The window hashes come
    * from the native O(len) rolling pass (plans.RollingHash — element
    * k is the window ending at position w + k); the per-position
    * substring re-fold it replaces lives on as the reference twin
    * [[cdcBoundariesHof]], property-pinned equal.
    */
  def cdcBoundaries(text: Column, w: Int, divisor: Int): Column = {
    val hs = graft.plans.GraftExtensions.rollingHash(text, w, 31, HashP)
    // `hs` must be the HOF's INPUT, never a subtree inside its lambda:
    // lambda bodies are re-evaluated per element with no common-
    // subexpression sharing, so an element_at(hs, i) probe would
    // recompute the whole rolling pass per position — measured O(len²)
    // (59 s vs 2 s on the sf0.1 CDC query). transform/filter evaluate
    // their input ONCE; the lambda sees elements and indices only.
    // A short text yields an empty hs and therefore no boundaries.
    filter(
      transform(hs, (h, k) => when(h % divisor === 0, k + lit(w)).otherwise(lit(-1))),
      x => x =!= -1)
  }

  /** The per-position formulation [[cdcBoundaries]] replaced
    * (O(len * w) substring re-folds through the interpreted HOF path).
    * Kept as the independent reference implementation PropertySpec
    * pins the rolling recurrence against — the two must stay
    * bit-identical on any input.
    */
  def cdcBoundariesHof(text: Column, w: Int, divisor: Int): Column =
    filter(
      when(length(text) >= w, sequence(lit(w), length(text)))
        .otherwise(array().cast("array<int>")),
      i => charHash(text.substr(i - lit(w - 1), lit(w))) % divisor === 0)

  /** CDC chunks of `text` as array<struct<s, l, h>> — 1-based start,
    * length, and the chunk content's [[charHash]]. Spans run between
    * consecutive boundaries, first chunk from position 1, tail chunk
    * to the end (dropped when a boundary IS the end — zero-length).
    * Caller guards NULL/empty text (no content, no chunks).
    */
  def cdcChunks(text: Column, w: Int, divisor: Int): Column = {
    val bs = cdcBoundaries(text, w, divisor)
    val starts = concat(array(lit(1)), transform(bs, b => b + 1))
    val ends = concat(bs, array(length(text)))
    val spans = filter(
      zip_with(starts, ends, (s0, e) => struct(s0.as("s"), (e - s0 + 1).as("l"))),
      sp => sp("l") > 0)
    transform(spans, sp =>
      struct(sp("s").as("s"), sp("l").as("l"),
        charHash(text.substr(sp("s"), sp("l"))).as("h")))
  }
}
