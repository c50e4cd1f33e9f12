package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Scale demonstration for the min-label connected-components operator
  * (the clustering stage of q_dedup_clusters): 1M nodes in 200k
  * chain-of-5 components â multi-hop, so label propagation genuinely
  * iterates (diameter 4, unlike DedupScale's pair components) â with
  * the full labeling asserted exactly: every node's cluster must be
  * its chain's minimum id.
  *
  * Usage: runMain graft.tools.CcScale [nNodes]
  */
object CcScale {
  def main(args: Array[String]): Unit = {
    val nNodes = args.headOption.map(_.toLong).getOrElse(1000000L)
    require(nNodes % 5 == 0 && nNodes > 0,
      s"nNodes must be a positive multiple of 5 (got $nNodes): the chain construction " +
        "and the cluster-count assertion both assume complete chains")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Session.driverLocal: the production dialect (ANSI off, UTC,
    // nanosAsLong — core/Session.defaultConf), so scale demos measure
    // the SAME semantics Verify/Bench run (advisor r10: raw builders
    // inherited Spark 4 ANSI-on here).
    val spark = graft.core.Session.driverLocal(cpus, "graft-scale-tool")
    spark.sparkContext.setLogLevel("WARN")

    // chains of 5: edges (i-1, i) except at chain starts
    val edges = spark.range(nNodes).filter(col("id") % 5 =!= 0)
      .select((col("id") - 1).as("a"), col("id").as("b"))
    val t0 = System.nanoTime()
    val labels = ConnectedComponents.labels(edges)
    val bad = labels.filter(col("cluster") =!= col("node") - pmod(col("node"), lit(5L))).count()
    val nClusters = labels.select(col("cluster")).distinct().count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[cc-scale] nodes=$nNodes%d clusters=$nClusters%d badLabels=$bad%d sec=$sec%.1f")
    require(bad == 0 && nClusters == nNodes / 5, "connected components mislabeled")
    spark.stop()
  }
}
