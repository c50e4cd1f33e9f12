package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.StarContraction

/** Scale demonstration for the large-star/small-star contraction
  * operator (q_dedup_clusters_deep): 1M nodes in 100 chains of 10,000
  * â component DIAMETER 9,999, where min-label propagation would need
  * 10,000 one-hop rounds (its guard throws at 20) and the alternating
  * contraction needs ~2 log2 n rounds (proven O(log^2 n)) â with the
  * full labeling asserted exactly: every node's cluster must be its
  * chain's minimum id.
  *
  * Usage: runMain graft.tools.DeepCcScale [nNodes] [chainLen]
  */
object DeepCcScale {
  def main(args: Array[String]): Unit = {
    val nNodes = args.headOption.map(_.toLong).getOrElse(1000000L)
    val chainLen = args.lift(1).map(_.toLong).getOrElse(10000L)
    require(nNodes > 0 && chainLen > 1 && nNodes % chainLen == 0,
      s"nNodes must be a positive multiple of chainLen (got $nNodes / $chainLen): " +
        "the construction and the cluster-count assertion assume complete chains")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Session.driverLocal: the production dialect (ANSI off, UTC,
    // nanosAsLong — core/Session.defaultConf), so scale demos measure
    // the SAME semantics Verify/Bench run (advisor r10: raw builders
    // inherited Spark 4 ANSI-on here).
    val spark = graft.core.Session.driverLocal(cpus, "graft-scale-tool")
    spark.sparkContext.setLogLevel("WARN")

    // chains of chainLen: edges (i-1, i) except at chain starts
    val edges = spark.range(nNodes).filter(col("id") % chainLen =!= 0)
      .select((col("id") - 1).as("a"), col("id").as("b"))
    val t0 = System.nanoTime()
    val labels = StarContraction.labels(edges)
    val bad = labels
      .filter(col("cluster") =!= col("node") - pmod(col("node"), lit(chainLen))).count()
    val nClusters = labels.select(col("cluster")).distinct().count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[deep-cc-scale] nodes=$nNodes%d chainLen=$chainLen%d " +
      f"clusters=$nClusters%d badLabels=$bad%d sec=$sec%.1f")
    require(bad == 0 && nClusters == nNodes / chainLen, "star contraction mislabeled")
    spark.stop()
  }
}
