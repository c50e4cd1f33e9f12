package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.TextKit

/** Scale demonstration for the MinHash+LSH dedup path (the pipeline of
  * q_dedup_minhash_lsh, unchanged): 1M synthetic documents with
  * planted near-duplicates, where the quadratic all-pairs baseline
  * would be 5e11 comparisons â not runnable â and the LSH bucket join
  * finishes in seconds.
  *
  * Corpus: doc i carries 40 tokens drawn deterministically from a 10k
  * vocabulary by a mixed hash of (content id, position). Every doc
  * with id % 100 == 1 is a near-copy of id-1 differing in ONE token
  * position: shingle sets share 35 of 38 3-shingles, Jaccard
  * 35/41 â 0.854 >= tau = 0.8. Random cross-doc collisions at that
  * threshold are vanishing, so planted pairs ARE the expected output
  * and recall is measurable exactly.
  *
  * Usage: runMain graft.tools.DedupScale [nDocs]
  * Prints stage timings, candidate/verified counts, and recall of the
  * planted pairs.
  *
  * MEASURED (1M docs, local[32], four stages): prepare
  * (shingle+minhash+bands) 8.2 s, candidate bucket-join 13.6 s
  * yielding 16,372 candidates, exact verify 3.1 s with 10,000/10,000
  * planted pairs recovered, ConnectedComponents clustering 3.3 s with
  * all 10,000 cluster labels asserted â ~28 s end to end against a
  * 5e11-comparison quadratic baseline. At 100k docs: ~9 s, 1,063
  * candidates, 1,000/1,000.
  */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Session.driverLocal: the production dialect (ANSI off, UTC,
    // nanosAsLong — core/Session.defaultConf), so scale demos measure
    // the SAME semantics Verify/Bench run (advisor r10: raw builders
    // inherited Spark 4 ANSI-on here).
    val spark = graft.core.Session.driverLocal(cpus, "graft-scale-tool")
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val v = f
      println(f"[dedup-scale] $name%-12s sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      v
    }

    // content id: dup docs reuse the previous doc's tokens...
    val cid = when(col("doc_id") % 100 === 1, col("doc_id") - 1).otherwise(col("doc_id"))
    val docs = spark.range(nDocs).select(col("id").as("doc_id"))
      .select(
        col("doc_id"),
        transform(sequence(lit(0), lit(39)), j => {
          // ...except ONE position, where the dup diverges. xxhash64
          // mixing, NOT a linear j-progression â a linear recipe makes
          // shifted docs into accidental near-dups (measured: 172k
          // unplanted J>=0.8 pairs at 100k docs before this fix).
          val base = when(col("doc_id") % 100 === 1 && j === 7, col("doc_id")).otherwise(cid)
          concat(lit("t"), pmod(xxhash64(base * 64 + j), lit(10000L)))
        }).as("w")
      )

    // the SAME pipeline object the oracle-checked query uses â see
    // operators.MinHashLsh
    import graft.operators.MinHashLsh
    val prepared = time("prepare") {
      val p = MinHashLsh.prepare(docs, "doc_id", "w").persist()
      p.count()
      p
    }
    val cand = time("candidates") {
      val c = MinHashLsh.candidates(prepared, "doc_id").persist()
      println(s"[dedup-scale] candidate pairs: ${c.count()}")
      c
    }
    val verified = time("verify") {
      val v = MinHashLsh.verify(prepared, cand, "doc_id", tau = 0.8)
        .select(col("d1"), col("d2"))
        .persist()
      println(s"[dedup-scale] verified pairs: ${v.count()}")
      v
    }
    // recall of planted pairs: (i-1, i) for every i % 100 == 1
    val planted = spark.range(nDocs).filter(col("id") % 100 === 1)
      .select((col("id") - 1).as("d1"), col("id").as("d2"))
    val nPlanted = planted.count()
    val hit = verified.join(planted, Seq("d1", "d2"), "left_semi").count()
    println(s"[dedup-scale] recall: $hit/$nPlanted planted pairs found; " +
      f"quadratic baseline would be ${nDocs * (nDocs - 1) / 2}%d comparisons")
    require(hit == nPlanted, s"LSH missed planted near-duplicates: $hit of $nPlanted")
    // final pipeline stage: pairs -> transitive near-dup CLUSTERS
    // (operators.ConnectedComponents, as in q_dedup_clusters). Every
    // planted pair is disjoint, so clusters = pairs and each cluster
    // label is the pair minimum â asserted exactly.
    time("cluster") {
      val cc = graft.operators.ConnectedComponents.labels(verified)
      val nClusters = cc.select(col("cluster")).distinct().count()
      // members are {i-1, i} for i % 100 == 1, so node % 100 is 0 or 1
      // and the expected min label is node - node % 100
      val badLabel = cc.filter(col("cluster") =!= col("node") - pmod(col("node"), lit(100L)))
        .count()
      println(s"[dedup-scale] clusters: $nClusters (expect $nPlanted), bad labels: $badLabel")
      require(nClusters == nPlanted && badLabel == 0, "clustering mismatch")
    }
    spark.stop()
  }
}
