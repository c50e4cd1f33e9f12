package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Scratch profiler for the llr/montecarlo shared pipeline: times each
  * sub-action separately to locate where the wall-clock goes at sf0.1.
  */
object ProfileMc {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // warmup identical to Bench
    locally {
      val r = spark.range(100000).select(col("id"), (col("id") % 97).as("k"))
      r.groupBy(col("k")).agg(sum(col("id")), count(lit(1)))
        .join(r.limit(100).withColumnRenamed("id", "id2"), "k")
        .write.mode("overwrite").format("noop").save()
    }

    timed("read lineitem count") { Tables(spark, dir, "lineitem").count() }
    val base = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .select(
        col("l_orderkey").as("report"),
        col("l_suppkey").as("target"),
        col("p_brand").as("reaction"))
      .distinct()
      .persist()
    timed("base distinct+persist+count") { base.count() }
    val total = timed("total distinct report") { base.select(col("report")).distinct().count() }
    val a = base.groupBy(col("target"), col("reaction")).agg(count(lit(1)).as("A"))
    timed("a groupBy") { a.write.mode("overwrite").format("noop").save() }
    val byTarget = base.groupBy(col("target")).agg(countDistinct(col("report")).as("nt"))
    timed("byTarget countDistinct") { byTarget.write.mode("overwrite").format("noop").save() }
    val byReaction = base.groupBy(col("reaction")).agg(countDistinct(col("report")).as("nr"))
    timed("byReaction countDistinct") { byReaction.write.mode("overwrite").format("noop").save() }
    val cells = a.join(byTarget, "target").join(byReaction, "reaction")
      .withColumn("C", col("nt") - col("A"))
      .withColumn("B", col("nr") - col("A"))
      .withColumn("D", lit(total) - col("nt") - col("nr") + col("A"))
      .withColumn(
        "llr",
        col("A") * (log(col("A")) - log(col("A") + col("B"))) +
          col("C") * (log(col("C")) - log(col("C") + col("D"))) -
          (col("A") + col("C")) * (log(col("A") + col("C")) -
            log(col("A") + col("B") + col("C") + col("D"))))
      .filter(col("llr").isNotNull && !isnan(col("llr")))
    timed("cells join+llr") { cells.write.mode("overwrite").format("noop").save() }
    timed("cells orderBy write") {
      cells.orderBy("target", "reaction").write.mode("overwrite").format("noop").save()
    }
    val critUdf = udf { (nJ: Long, nI: Seq[Long], total: Long, seed: Long) =>
      graft.functions.MonteCarlo.criticalValue(100, nJ.toInt, nI, total.toInt, 0.95, seed)
    }
    val cellsP = cells.persist()
    timed("cells persist") { cellsP.count() }
    val crit = cellsP
      .groupBy(col("target"))
      .agg(
        first(col("nt")).as("nt"),
        sort_array(collect_list(struct(col("reaction"), col("nr")))).as("pairs"))
      .select(
        col("target"),
        critUdf(col("nt"), transform(col("pairs"), p => p.getField("nr")), lit(total),
          col("target")).as("critval"))
    timed("crit UDF") { crit.write.mode("overwrite").format("noop").save() }
    spark.stop()
  }
}
