package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup on synthetic data (no testdata reads): the
    // first timed query should not absorb JVM class loading and
    // whole-stage-codegen compiler startup.
    locally {
      import org.apache.spark.sql.functions._
      val r = spark.range(100000).select(col("id"), (col("id") % 97).as("k"))
      r.groupBy(col("k")).agg(sum(col("id")), count(lit(1)))
        .join(r.limit(100).withColumnRenamed("id", "id2"), "k")
        .write.mode("overwrite").format("noop").save()
    }
    // noop sink: forces full computation of every output column —
    // count() would let Catalyst prune the projections being measured.
    // A failed query is recorded as NEGATIVE elapsed time (sentinel),
    // never silently folded into the total as if it succeeded.
    var errors = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch {
          case e: Throwable =>
            errors ::= s"$name: ${e.getClass.getSimpleName}"
            false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) dt else -dt)
    }
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v > 0 => v }.sum
    val errJson = errors.reverse.map(e => "\"" + e + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    // Belt and braces against stdout-tail truncation: the same line is
    // written whole to a file (overridable via SPARK_GRAFT_BENCH_OUT).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outPath),
        (line + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
