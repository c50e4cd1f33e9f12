package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Graph
import graft.queries.Tables

/** Micro-bench: path-doubling vs semi-naive frontier transitive
  * closure on the q_graph_node_document DAG (binary tree over part).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.ClosureCompare
  * Prints one line per variant: name, rows, seconds. Keeps the two
  * row counts so a mismatch fails loudly here, not just in GraphSpec.
  */
object ClosureCompare {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Session.driverLocal: the production dialect (ANSI off, UTC,
    // nanosAsLong — core/Session.defaultConf), so scale demos measure
    // the SAME semantics Verify/Bench run (advisor r10: raw builders
    // inherited Spark 4 ANSI-on here).
    val spark = graft.core.Session.driverLocal(cpus, "graft-scale-tool")
    spark.sparkContext.setLogLevel("WARN")

    def treeEdges = Tables(spark, dir, "part")
      .filter(col("p_partkey") >= 2)
      .select(col("p_partkey").as("child"), expr("p_partkey div 2").as("parent"))
    // the q_graph_ancestry_dag multi-parent DAG: parents k div 2, k div 3
    def dagEdges = {
      val part = Tables(spark, dir, "part").select(col("p_partkey"))
      part.filter(col("p_partkey") >= 2)
        .select(col("p_partkey").as("child"), expr("p_partkey div 2").as("parent"))
        .union(part.filter(col("p_partkey") >= 3)
          .select(col("p_partkey").as("child"), expr("p_partkey div 3").as("parent")))
    }

    def time(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[closure-compare] $name%-14s rows=$n%d sec=$sec%.1f")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      n
    }

    // warmup: scan + codegen
    treeEdges.count(); dagEdges.count()
    for ((graph, edges) <- Seq("tree" -> (() => treeEdges), "dag" -> (() => dagEdges))) {
      // NB: explicitly the plain-doubling entry point â transitiveClosure
      // is an alias for the smart variant, which has its own leg below
      val a = time(s"$graph/doubling")(Graph.transitiveClosureDoubling(edges()).count())
      val b = time(s"$graph/frontier")(Graph.transitiveClosureFrontier(edges()).count())
      val c = time(s"$graph/smart")(Graph.transitiveClosureSmart(edges()).count())
      require(a == b && b == c, s"$graph closure row counts differ: doubling=$a frontier=$b smart=$c")
    }
    spark.stop()
  }
}
