package graft.tools

/** HNSW recall probe ABOVE the oracle scale (the r17 bloom-point
  * lesson: an sf-dependent contract must be exercised at the bench
  * scale factor, not just the sf0.01 gate): runs the
  * `q_similarity_hnsw` rung at the given sfDir and counts queries
  * whose served top-3 escaped the exact top-10.
  *
  * Measured (this machine, local[32]):
  *  - sf0.01 (gate fixture): 10 queries, 0 misses — and hash-green
  *    under the DuckDB oracle (the TRUE column is the contract).
  *  - sf0.1 (bench fixture, ~10x corpus, 4 shards): 10 queries,
  *    0 misses, rung wall 4.5 s.
  *
  * Usage: runMain graft.tools.HnswCheck [sfDir]
  */
object HnswCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Session.driverLocal("32", "graft-hnsw-check")
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q_similarity_hnsw")(spark, sfDir)
    val rows = df.collect()
    val bad = rows.filterNot(_.getBoolean(1))
    println(s"HNSWCHECK total=${rows.length} misses=${bad.length}")
    bad.foreach(r => println(s"MISS: $r"))
    spark.stop()
  }
}
