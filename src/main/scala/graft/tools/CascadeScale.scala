package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.operators.GlobalRank

/** Scale demonstration for the search-cascade's global-rank cutover
  * (q_search_index_cascade vs q_search_index_cascade_scaled): the
  * cascade's TAIL â entity-level aggregate -> global relevance rank ->
  * max-rank fold -> multiplier â run at an entity count where
  * "dimension-sized" stops being true and the partition-less window
  * funnels every row through ONE task.
  *
  * The fixture-scale gate already proves the two variants hash-equal
  * on the REAL cascade (same oracle, CORRECTNESS rows); what it cannot
  * show is the point of the cutover. This tool synthesizes the
  * part-level aggregate the cascade feeds its rank (10M entities,
  * realistic ~100-byte tier-label payload per row, unique
  * (totdec desc, key asc) sort), then times the windowed and the
  * GlobalRank tails on identical input and requires checksum-equal
  * multiplier outputs.
  *
  * Usage: runMain graft.tools.CascadeScale [rows]
  *
  * MEASURED (local[32], checksums equal at both scales): 10M entities
  * â GlobalRank tail 10.8 s vs window tail 17.4 s (1.6x); 30M â
  * 24.2 s vs 144.9 s (6.0x). The two-pass leg scales near-linearly
  * (2.2x time for 3x rows) while the window leg degrades
  * super-linearly (8.3x) once the single task's sort exceeds its
  * memory share and spills â that knee is the cutover point. On a
  * real cluster the window leg also ships the whole entity table to
  * one executor; the cutover is an availability fix, not a tuning
  * knob.
  */
object CascadeScale {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Session.driverLocal: the production dialect (ANSI off, UTC,
    // nanosAsLong — core/Session.defaultConf), so scale demos measure
    // the SAME semantics Verify/Bench run (advisor r10: raw builders
    // inherited Spark 4 ANSI-on here).
    val spark = graft.core.Session.driverLocal(cpus, "graft-scale-tool")
    spark.sparkContext.setLogLevel("WARN")

    // The cascade's `agged` shape at entity scale: unique key, skewless
    // pseudo-random revenue (unique ORDER thanks to the key tiebreak),
    // and the six tier-label strings that make rows cascade-wide
    // (~100 bytes) â the single-task sort pays for row width too.
    def lab(salt: Int) =
      concat(lit("L"), pmod(xxhash64(col("l_partkey") + salt), lit(100000L)))
    def agged = spark.range(rows).select(col("id").as("l_partkey"))
      .select(
        col("l_partkey"),
        lab(1).as("cust_labels_50"), lab(2).as("cust_labels_25"), lab(3).as("cust_labels_5"),
        lab(4).as("supp_labels_50"), lab(5).as("supp_labels_25"), lab(6).as("supp_labels_5"),
        pmod(xxhash64(col("l_partkey") * 31), lit(1000L)).as("n_assoc"),
        pmod(xxhash64(col("l_partkey")), lit(1000000000000L)).cast(DoubleType).as("totdec")
      )

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val v = f
      println(f"[cascade-scale] $name%-18s sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      v
    }

    // the searchCascade tail, verbatim modulo the rank source: rank ->
    // localCheckpoint -> O(1) max fold -> multiplier -> floor micros
    def tail(g0: org.apache.spark.sql.DataFrame): Long = {
      val g = g0.localCheckpoint()
      val maxRow = g.agg(max(col("grank"))).first()
      val maxRank = if (maxRow.isNullAt(0)) 1L else maxRow.getAs[Number](0).longValue()
      val mult =
        if (maxRank == 1L) lit(2.0)
        else lit(1.0) +
          (lit(maxRank) - col("grank")).cast(DoubleType) / lit((maxRank - 1).toDouble)
      // deterministic 1/1000 sample checksum over the final multiplier
      // column â the same value both variants must produce bit-equal
      g.select(col("l_partkey"), floor(mult * 1e6).cast("long").as("m"))
        .filter(col("l_partkey") % 1000 === 0)
        .agg(coalesce(sum((col("m") % 1000003) * (col("l_partkey") % 1000003)), lit(0L)))
        .first().getLong(0)
    }

    val sortCols = Seq(col("totdec").desc, col("l_partkey").asc)
    val a = time("tail/global-rank") {
      tail(GlobalRank.rowNumber(agged, sortCols, "grank"))
    }
    val b = time("tail/window") {
      // rank() == row_number() here: the key tiebreak makes the sort
      // unique (the same argument the cascade's scaladoc makes)
      tail(agged.withColumn("grank", rank().over(Window.orderBy(sortCols: _*))))
    }
    require(a == b, s"cascade tail checksums differ: global-rank=$a window=$b")
    println(s"[cascade-scale] checksums equal: $a")
    spark.stop()
  }
}
