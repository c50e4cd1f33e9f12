package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.{ColumnKit, Stemmer, TextKit}

/** Property-based invariants for the pure kernels (the reference has
  * only table-driven checks, SURVEY.md §5 — these generalize them).
  * Driver-side properties run without Spark where the function has a
  * pure twin; column-expression properties run through a tiny DF.
  */
class PropertySpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  // scalatestplus-scalacheck is not on the offline classpath; this is a
  // minimal deterministic forAll over scalacheck generators (fixed
  // seeds -> reproducible runs).
  private def forAll[A](gen: Gen[A], cases: Int = 25)(f: A => Unit): Unit =
    (1 to cases).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb), 25) { case (a, b) => f(a, b) }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)

  test("Stemmer is idempotent-ish: stems are never longer than input") {
    forAll(word) { w =>
      Stemmer.stem(w).length should be <= math.max(w.length, 3)
    }
  }

  test("Stemmer output is stable (pure function)") {
    forAll(word) { w =>
      Stemmer.stem(w) shouldBe Stemmer.stem(w)
    }
  }

  test("charHash stays within [0, P) and is deterministic") {
    import spark.implicits._
    forAll(Gen.listOfN(5, word)) { ws =>
      val out = ws.toDF("w").select(TextKit.charHash(col("w"))).collect().map(_.getLong(0))
      all(out) should (be >= 0L and be < TextKit.HashP)
      val again = ws.toDF("w").select(TextKit.charHash(col("w"))).collect().map(_.getLong(0))
      out shouldBe again
    }
  }

  test("native charHash is bit-identical to the HOF fold it replaced") {
    import spark.implicits._
    // words + punctuation + unicode (greek, accents) — the corpus the
    // grounding normalizer sees; the native expression must agree with
    // the independent HOF formulation on every input and multiplier
    val mixed = Gen.listOf(Gen.oneOf(
      word, Gen.const(""), Gen.const("  spaced  out  "),
      Gen.const("αβγ-δ"), Gen.const("café é"), Gen.const("a1!b2?c3"),
      // astral plane: U+1D11E (musical G clef) and an emoji — the
      // surrogate-pair regime the code-point contract claims
      Gen.const("a𝄞b"), Gen.const("x😀y"))
    ).map(_.mkString(" "))
    forAll(Gen.zip(mixed, Gen.oneOf(31, 37))) { case (s, m) =>
      val row = Seq(s).toDF("w")
        .select(TextKit.charHash(col("w"), m), TextKit.charHashHof(col("w"), m))
        .head()
      row.getLong(0) shouldBe row.getLong(1)
    }
  }

  test("rolling window hash is bit-identical to the per-position substring fold") {
    import spark.implicits._
    // the CDC hot path: plans.RollingHash's O(len) recurrence vs the
    // independent O(len*w) charHash(substr) formulation — equal per
    // ELEMENT on every input, including surrogate pairs (codepoint
    // contract), strings shorter than the window (empty array), and
    // exact window-length strings
    val texts = Gen.listOf(Gen.oneOf(
      word, Gen.const(""), Gen.const("short"), Gen.const("exactly sixteen!"),
      Gen.const("a𝄞b😀 mixed unicode content flowing past one window"),
      Gen.const("the quick brown fox jumps over the lazy dog repeatedly")))
      .map(_.mkString(" "))
    forAll(texts) { s =>
      for (w <- Seq(4, 16)) {
        // qualify length(): ScalaTest Matchers shadows the sql function
        val len = org.apache.spark.sql.functions.length(col("t"))
        val row = Seq(s).toDF("t")
          .select(
            graft.plans.GraftExtensions.rollingHash(col("t"), w, 31, TextKit.HashP),
            when(len >= w,
              transform(sequence(lit(w), len),
                i => TextKit.charHash(col("t").substr(i - lit(w - 1), lit(w)))))
              .otherwise(array().cast("array<long>")))
          .head()
        row.getSeq[Long](0) shouldBe row.getSeq[Long](1)
      }
    }
    // and the two boundary formulations agree end to end
    val doc = (0 until 80).map(i => s"tk${i * 7919 % 101}").mkString(" ")
    val b = Seq(doc).toDF("t")
      .select(
        TextKit.cdcBoundaries(col("t"), 16, 64),
        TextKit.cdcBoundariesHof(col("t"), 16, 64))
      .head()
    b.getSeq[Int](0) shouldBe b.getSeq[Int](1)
    b.getSeq[Int](0).nonEmpty shouldBe true // non-vacuous: boundaries exist
  }

  test("minhash signature of a superset is elementwise <= the subset's") {
    import spark.implicits._
    forAll(Gen.nonEmptyListOf(Gen.posNum[Long]), Gen.nonEmptyListOf(Gen.posNum[Long])) {
      (a, b) =>
        val sub = a.distinct
        val sup = (a ++ b).distinct
        val df = Seq((sub, sup)).toDF("sub", "sup")
        val row = df.select(
          TextKit.minhashSignature(col("sub"), 8).as("s1"),
          TextKit.minhashSignature(col("sup"), 8).as("s2")
        ).head
        val s1 = row.getSeq[Long](0)
        val s2 = row.getSeq[Long](1)
        s1.zip(s2).foreach { case (x, y) => y should be <= x }
    }
  }

  test("harmonicSum is bounded by maxHarmonicSum times the max element") {
    import spark.implicits._
    forAll(Gen.nonEmptyListOf(Gen.choose(0.0, 1.0))) { xs =>
      val row = Seq(Tuple1(xs)).toDF("xs")
        .select(
          ColumnKit.harmonicSum(col("xs")).as("h"),
          ColumnKit.maxHarmonicSum(org.apache.spark.sql.functions.size(col("xs"))).as("m")
        ).head
      row.getDouble(0) should be <= row.getDouble(1) * xs.max + 1e-9
      row.getDouble(0) should be >= 0.0
    }
  }

  test("priorityDedup output ids are unique and priority-sorted") {
    import spark.implicits._
    val pairGen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(1, 3), Gen.choose(1, 9).map(i => s"id$i")))
    forAll(pairGen) { pairs =>
      val out = Seq(Tuple1(pairs)).toDF("raw")
        .select(
          ColumnKit.priorityDedup(
            transform(col("raw"), x => struct(x.getField("_1").as("priority"), x.getField("_2").as("id")))
          ).as("ids")
        ).as[Seq[String]].head
      out.distinct shouldBe out                      // unique
      out.toSet shouldBe pairs.map(_._2).toSet        // same id universe
    }
  }

  test("PPJoin prefix+length+positional filters are lossless for Jaccard >= tau") {
    // The theorems behind q_dedup_jaccard_ppjoin: under a global
    // (document-frequency asc, value) order, any pair with J >= tau
    // (1) shares its smallest common element inside BOTH prefixes of
    // length n - ceil(tau*n) + 1 (prefix filter), (2) satisfies
    // tau * max(n1,n2) <= min(n1,n2) (length filter), and (3) has at
    // least one shared prefix occurrence passing the POSITIONAL bound
    // (min(n-pos)+1)(1+tau) >= tau(n1+n2) — the exact conjunction the
    // candidate join applies, so this property mirrors the production
    // condition term for term. Verified against brute force on random
    // small-vocab corpora (small vocab -> dense overlaps).
    val tau = 0.5
    val docGen = Gen.nonEmptyListOf(Gen.choose(0, 14)).map(_.map(i => s"w$i"))
    forAll(Gen.listOfN(12, docGen), 25) { corpus =>
      val sets = corpus.map(_.toSet).zipWithIndex.filter(_._1.nonEmpty)
      val df = sets.flatMap(_._1).groupBy(identity).map { case (k, v) => k -> v.size }
      // 1-based canonical position of every token in the doc's order
      def positions(s: Set[String]): Map[String, Int] =
        s.toSeq.sortBy(x => (df(x), x)).zipWithIndex.map { case (t, i) => t -> (i + 1) }.toMap
      def prefixLen(n: Int): Int = n - math.ceil(tau * n).toInt + 1
      for {
        (a, i) <- sets
        (b, j2) <- sets if i < j2
        inter = (a & b).size
        jac = inter.toDouble / (a.size + b.size - inter)
        if jac >= tau
      } {
        val (pa, pb) = (positions(a), positions(b))
        val (n1, n2) = (a.size, b.size)
        withClue(s"pair ($a, $b) jac=$jac escaped the length filter: ") {
          (tau * math.max(n1, n2) <= math.min(n1, n2)) shouldBe true
        }
        val survivors = (a & b).filter { s =>
          pa(s) <= prefixLen(n1) && pb(s) <= prefixLen(n2) &&
            (math.min(n1 - pa(s), n2 - pb(s)) + 1) * (1.0 + tau) >= tau * (n1 + n2)
        }
        withClue(s"pair ($a, $b) jac=$jac escaped the prefix+positional filters: ") {
          survivors should not be empty
        }
      }
    }
  }

  test("incremental cross-batch dedup equals the batch pipeline restricted to cross pairs") {
    // The composition theorem behind q_dedup_incremental: band keys
    // are a pure per-document function, so a cross pair (old, new)
    // shares a band bucket in the cross-batch join iff it does in the
    // whole-corpus self-join, and both paths confirm with the same
    // exact Jaccard over the same shingle sets — the incremental
    // result must therefore equal the batch result restricted to
    // pairs that straddle the split, EXACTLY (not probabilistically).
    // Random small-vocab corpora make high-Jaccard pairs common.
    import spark.implicits._
    import graft.operators.MinHashLsh
    val tau = 0.5
    val docGen = Gen.listOfN(6, Gen.choose(0, 7)).map(_.map(i => s"w$i"))
    forAll(Gen.listOfN(20, docGen), 5) { corpus =>
      val df = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "w")
      val p = MinHashLsh.prepare(df, "doc_id", "w").localCheckpoint()
      val full = MinHashLsh
        .verify(p, MinHashLsh.candidates(p, "doc_id"), "doc_id", tau)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val idx = MinHashLsh.index(
        MinHashLsh.prepare(df.filter(col("doc_id") % 2 === 0), "doc_id", "w"), "doc_id")
      val np = MinHashLsh.prepare(df.filter(col("doc_id") % 2 === 1), "doc_id", "w")
      val cross = MinHashLsh
        .verifyAgainst(np, idx,
          MinHashLsh.candidatesAgainst(np, idx, "doc_id"), "doc_id", tau)
        .select("d_new", "d_old").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = full.collect {
        case (a, b) if (a % 2 == 0) != (b % 2 == 0) =>
          if (a % 2 == 1) (a, b) else (b, a) // normalize to (new, old)
      }
      cross shouldBe expected
    }
  }

  test("unionDifferentSchema preserves total row count and unions columns") {
    import spark.implicits._
    forAll(Gen.choose(0, 5), Gen.choose(0, 5)) { (n, m) =>
      val a = (1 to n).map(i => (i.toLong, s"a$i")).toDF("id", "x")
      val b = (1 to m).map(i => (i.toLong, i * 1.5)).toDF("id", "y")
      val u = ColumnKit.unionDifferentSchema(a, b)
      u.count() shouldBe (n + m).toLong
      u.columns.toSet shouldBe Set("id", "x", "y")
    }
  }

  test("GlobalRank and PrefixSum are partition-count invariant on random data") {
    import spark.implicits._
    import graft.operators.{GlobalRank, PrefixSum}
    // the two-pass operators must give the sequential answer no matter
    // how the range shuffle splits — 1, 3, and 7 partitions bit-equal
    forAll(Gen.listOfN(40, Gen.zip(Gen.choose(-1000L, 1000L), Gen.choose(0L, 50L))), cases = 5) { rows =>
      val distinctKeys = rows.map(_._1).distinct.map(k => (k, rows.toMap.apply(k)))
      val df = distinctKeys.toDF("k", "n")
      val expectRank = distinctKeys.sortBy(_._1).map(_._1).zipWithIndex
        .map { case (k, i) => k -> (i + 1L) }.toMap
      val expectCum = distinctKeys.sortBy(_._1)
        .scanLeft((0L, 0L)) { case ((_, acc), (k, n)) => (k, acc + n) }.drop(1).toMap
      Seq(1, 3, 7).foreach { p =>
        val r = GlobalRank.rowNumber(df, Seq(col("k").asc), "rn", numPartitions = p)
          .select(col("k"), col("rn")).as[(Long, Long)].collect().toMap
        r shouldBe expectRank
        val c = PrefixSum.runningSum(df, Seq(col("k").asc), "n", "cum", numPartitions = p)
          .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
        c shouldBe expectCum
      }
    }
  }

  test("substring extents aggregate to exactly the repeated-ngram counts (cross-query invariant)") {
    // q_dedup_substring_extents chains the SAME per-position repeat
    // marks q_corpus_repeated_ngrams aggregates, so for every doc:
    //   sum(n_grams over its extents) == n_repeated,
    // and each extent's token length is its gram count + 4 exactly.
    // Run both registry queries on the real sf0.001 fixture and join.
    import spark.implicits._
    val extents = SparkEntry.queries("q_dedup_substring_extents")(spark, sfDir)
      .groupBy(col("doc_id"))
      .agg(sum(col("n_grams")).as("ext_grams"))
      .as[(Long, Long)].collect().toMap
    val marks = SparkEntry.queries("q_corpus_repeated_ngrams")(spark, sfDir)
      .select(col("doc_id"), col("n_repeated"))
      .as[(Long, Int)].collect().toMap
    marks.nonEmpty shouldBe true
    for ((doc, rep) <- marks)
      extents.getOrElse(doc, 0L) shouldBe rep.toLong
    extents.keySet.subsetOf(marks.keySet) shouldBe true
    val shapes = SparkEntry.queries("q_dedup_substring_extents")(spark, sfDir)
      .select(col("extent_tokens") - col("n_grams") - 4)
      .as[Int].collect()
    shapes.nonEmpty shouldBe true
    all(shapes) shouldBe 0
  }

  test("substring cut removes exactly the extent-covered token spans (cross-query invariant)") {
    // q_dedup_substring_cut removes the union of [start, end+4] token
    // spans over q_dedup_substring_extents' extents, so per doc:
    //   - docs with extents == docs with n_removed > 0,
    //   - max(extent_tokens) <= n_removed <= sum(extent_tokens)
    //     (spans of nearby extents may overlap, so the union is
    //     between the largest span and the sum of spans),
    //   - a doc with exactly ONE extent removes exactly extent_tokens,
    //   - n_kept + n_removed == n_tokens always.
    import spark.implicits._
    val ext = SparkEntry.queries("q_dedup_substring_extents")(spark, sfDir)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ext"),
        max(col("extent_tokens")).as("max_span"),
        sum(col("extent_tokens")).as("sum_span"))
      .as[(Long, Long, Int, Long)].collect()
      .map { case (d, n, mx, sm) => d -> (n, mx.toLong, sm) }.toMap
    val cut = SparkEntry.queries("q_dedup_substring_cut")(spark, sfDir)
      .select(col("doc_id"), col("n_tokens"), col("n_kept"), col("n_removed"))
      .as[(Long, Int, Int, Int)].collect()
    cut.nonEmpty shouldBe true
    ext.nonEmpty shouldBe true
    for ((doc, nTok, nKept, nRem) <- cut) {
      withClue(s"doc $doc: ") {
        (nKept + nRem) shouldBe nTok
        ext.get(doc) match {
          case None => nRem shouldBe 0
          case Some((nExt, maxSpan, sumSpan)) =>
            nRem.toLong should be >= maxSpan
            nRem.toLong should be <= sumSpan
            if (nExt == 1L) nRem.toLong shouldBe sumSpan
        }
      }
    }
    cut.filter(_._4 > 0).map(_._1).toSet shouldBe ext.keySet
  }

  test("substring extents and cut match a brute-force reference on random corpora") {
    // The cross-query invariants above are necessary conditions; this
    // is the sufficient one: on seeded random corpora (tiny vocab ->
    // dense 5-gram collisions), the registry queries must reproduce a
    // direct Scala re-implementation of the definition — corpus-wide
    // 5-gram counts, repeated positions, maximal islands, covered
    // union, surviving-token reassembly — row for row.
    import spark.implicits._
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "f")
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      val docs = (0 until 12).map { id =>
        val n = rng.nextInt(28)
        (id.toLong, (0 until n).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val dir = java.nio.file.Files.createTempDirectory(s"substr-prop-$seed").toString
      docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      // brute force
      val toks = docs.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toVector
      }.toMap
      val grams = toks.toSeq.flatMap { case (id, w) =>
        (0 to w.length - 5).map(i => (id, i + 1, w.slice(i, i + 5).mkString(" ")))
      }
      val cnt = grams.groupBy(_._3).view.mapValues(_.size).toMap
      val rep = grams.filter(g => cnt(g._3) >= 2).map(g => (g._1, g._2))
      val expExtents = rep.groupBy(_._1).toSeq.flatMap { case (id, ps) =>
        val sorted = ps.map(_._2).sorted
        val islands = sorted.foldLeft(List.empty[List[Int]]) {
          case (acc, p) if acc.nonEmpty && acc.head.head == p - 1 => (p :: acc.head) :: acc.tail
          case (acc, p) => List(p) :: acc
        }
        islands.map(i => (id, i.min, i.max, i.size, i.max - i.min + 5))
      }.sortBy(e => (e._1, e._2))
      val expCut = docs.map { case (id, _) =>
        val w = toks(id)
        val covered = rep.filter(_._1 == id)
          .flatMap { case (_, p) => p to (p + 4) }.toSet
        val kept = w.zipWithIndex.collect { case (t, i) if !covered(i + 1) => t }
        val cleaned = if (kept.isEmpty) None else Some(kept.mkString(" "))
        (id, w.length, kept.length, w.length - kept.length, cleaned)
      }.sortBy(_._1)

      withClue(s"seed $seed extents: ") {
        val got = SparkEntry.queries("q_dedup_substring_extents")(spark, dir)
          .as[(Long, Int, Int, Int, Int)].collect().toSeq
          .map { case (d, a, b, c, e) => (d, a, b, c, e) }
        got shouldBe expExtents.map { case (d, a, b, c, e) => (d.toLong, a, b, c, e) }
      }
      withClue(s"seed $seed cut: ") {
        val got = SparkEntry.queries("q_dedup_substring_cut")(spark, dir)
          .select(col("doc_id"), col("n_tokens"), col("n_kept"), col("n_removed"),
            col("cleaned_md5"))
          .as[(Long, Int, Int, Int, Option[String])].collect().toSeq.sortBy(_._1)
        val exp = expCut.map { case (id, nt, nk, nr, cleaned) =>
          (id, nt, nk, nr, cleaned.map { c =>
            java.security.MessageDigest.getInstance("MD5")
              .digest(c.getBytes("UTF-8")).map("%02x".format(_)).mkString
          })
        }
        got shouldBe exp
      }
    }
  }

  test("quantize8 output is int8-representable: tinyint round-trip is lossless") {
    // the SQ8 scaladoc claims every quantized coordinate fits int8
    // (|q| <= 127, so a production table can persist tinyint at 8x
    // compression); prove it on the real fixture + adversarial shapes
    // (single-spike vectors, where the 1-ulp division slack is
    // largest).
    import graft.functions.VectorKit
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(VectorKit.toDouble(col("embedding")).as("e"))
      .withColumn("nrm", VectorKit.norm(col("e")))
      .filter(VectorKit.normalizable(col("nrm")))
      .select(VectorKit.quantize8(col("e"), col("nrm")).as("q8"))
    val bad = emb.select(
      sum(when(exists(col("q8"),
        q => abs(q) > 127 || q =!= q.cast("byte").cast("double")), 1)
        .otherwise(0)).as("bad")).first().getLong(0)
    bad shouldBe 0L
    // adversarial: one-hot spikes (ratio exactly 1) and near-spikes
    import spark.implicits._
    val spikes = Seq(
      Seq.tabulate(64)(i => if (i == 0) 1e30 else 0.0),
      Seq.tabulate(64)(i => if (i == 7) -3.14e-20 else 0.0),
      Seq.tabulate(64)(i => if (i < 2) 5.0 else 0.0)
    ).toDF("e")
      .withColumn("nrm", VectorKit.norm(col("e")))
      .filter(VectorKit.normalizable(col("nrm")))
      .select(VectorKit.quantize8(col("e"), col("nrm")).as("q8"))
      .collect()
    spikes should have length 3
    spikes.foreach { r =>
      r.getSeq[Double](0).foreach { q =>
        assert(q.isWhole && math.abs(q) <= 127.0, s"non-int8 quantized value $q")
      }
    }
  }
}
