package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Evidence for the engine's skew posture: AQE's skew-join handling
  * (enabled in core.Session) actually splits an oversized partition at
  * runtime. The thresholds are lowered inside the test so a synthetic
  * hot key trips the optimization at test scale, then restored.
  */
class SkewJoinSpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  test("AQE splits the hot-key partition in a skewed sort-merge join") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // one hot key carrying ~all rows + a long payload
      val fact = spark.range(20000)
        .select(
          when($"id" % 100 === 0, $"id").otherwise(lit(7L)).as("k"),
          concat(lit("x" * 64), $"id").as("payload"))
      val dim = spark.range(200).select($"id".as("k"), concat(lit("d"), $"id").as("label"))
      val joined = fact.join(dim, "k")
      // materialize THIS Dataset's own QueryExecution (count() would
      // build a separate aggregate plan and leave this one unexecuted)
      joined.collect()
      val adaptive = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
      adaptive shouldBe defined
      val finalPlan = adaptive.get.executedPlan.toString()
      withClue(s"no skew split in final adaptive plan:\n$finalPlan\n") {
        finalPlan should include("skew=true")
      }
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }


  test("runtime bloom-filter join pruning injects might_contain on the large side") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // keep the join shuffled
      // large side: parquet scan (file-source stats make it eligible);
      // small side: selective filter -> bloom build candidate
      val li = graft.queries.Tables(spark, sfDir, "lineitem")
      val ords = graft.queries.Tables(spark, sfDir, "orders")
        .filter($"o_orderstatus" === "P" && $"o_orderkey" % 97 === 0)
      val joined = li.join(ords, $"l_orderkey" === $"o_orderkey")
      val optimized = joined.queryExecution.optimizedPlan.toString()
      withClue(s"no bloom filter in optimized plan:\n$optimized\n") {
        optimized should include("might_contain")
        optimized should include("bloom_filter_agg")
      }
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
