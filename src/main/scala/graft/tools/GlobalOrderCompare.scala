package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{GlobalRank, PrefixSum}

/** Micro-bench: the distributed two-pass global-order operators vs the
  * partition-less windows they replace, at a row count where the
  * single-task funnel actually bites (default 50M â far beyond any
  * test SF, small enough for local[32]).
  *
  * Usage: runMain graft.tools.GlobalOrderCompare [rows]
  * Prints one line per leg: name, checksum, seconds. The checksums
  * (sum of rank*key over a deterministic 1/1000 sample) must match
  * between each pair â a mismatched cutover fails loudly here.
  */
object GlobalOrderCompare {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(50000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Session.driverLocal: the production dialect (ANSI off, UTC,
    // nanosAsLong — core/Session.defaultConf), so scale demos measure
    // the SAME semantics Verify/Bench run (advisor r10: raw builders
    // inherited Spark 4 ANSI-on here).
    val spark = graft.core.Session.driverLocal(cpus, "graft-scale-tool")
    spark.sparkContext.setLogLevel("WARN")

    // shuffled unique keys: a fixed odd multiplier mod 2^61-1 permutes
    // the range deterministically
    def base = spark.range(rows).select(
      col("id"),
      pmod(col("id") * 2654435761L, lit(2305843009213693951L)).as("k"),
      (col("id") % 97).as("n")
    )

    def time(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val v = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[global-order] $name%-16s checksum=$v%d sec=$sec%.1f")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      v
    }
    // deterministic 1/1000 sample keyed on k; both factors reduced mod
    // ~1e6 so the 50k-row sum stays far under Long.MaxValue
    def checksum(df: org.apache.spark.sql.DataFrame, valCol: String): Long =
      df.filter(col("k") % 1000 === 0)
        .agg(coalesce(sum((col(valCol) % 1000003) * (col("k") % 1000003)), lit(0L)))
        .first().getLong(0) // coalesce: tiny [rows] args can leave the sample empty

    val a = time("rank/two-pass") {
      checksum(GlobalRank.rowNumber(base, Seq(col("k").asc), "rn"), "rn")
    }
    val b = time("rank/window") {
      checksum(base.withColumn("rn", row_number().over(Window.orderBy(col("k").asc))), "rn")
    }
    require(a == b, s"global rank checksums differ: two-pass=$a window=$b")

    val c = time("cumsum/two-pass") {
      checksum(PrefixSum.runningSum(base, Seq(col("k").asc), "n", "cum"), "cum")
    }
    val d = time("cumsum/window") {
      checksum(base.withColumn("cum",
        sum(col("n")).over(Window.orderBy(col("k").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))), "cum")
    }
    require(c == d, s"global cumsum checksums differ: two-pass=$c window=$d")
    spark.stop()
  }
}
