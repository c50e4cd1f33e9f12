package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core.Config

class MainSpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  test("Config parses the step tree") {
    val cfg = Config.fromJsonString(
      """{"appName":"t","sparkConf":{"spark.x":"1"},
         "steps":[{"name":"s1","query":"q_agg_pricing_summary",
                   "sfDir":"/data","output":{"path":"/out","format":"json",
                   "partitionBy":["y"],"mode":"overwrite"}}]}"""
    )
    cfg.appName shouldBe "t"
    cfg.sparkConf shouldBe Map("spark.x" -> "1")
    cfg.steps should have length 1
    cfg.steps.head.output.format shouldBe "json"
    cfg.steps.head.output.partitionBy shouldBe Seq("y")
  }

  test("runStep executes a registered query and writes the output") {
    val out = Files.createTempDirectory("graft-step").toString
    val cfg = Config.fromJsonString(
      s"""{"appName":"t","steps":[
            {"name":"pricing","query":"q_agg_pricing_summary",
             "sfDir":"$sfDir","output":{"path":"$out/pricing"}}]}"""
    )
    Main.runStep(spark, cfg.steps.head)
    spark.read.parquet(s"$out/pricing").count() should be > 0L
  }

  test("unknown step query fails fast") {
    val cfg = Config.fromJsonString(
      """{"steps":[{"name":"x","query":"q_nope","sfDir":"/d","output":{"path":"/o"}}]}"""
    )
    an[IllegalArgumentException] should be thrownBy Main.runStep(spark, cfg.steps.head)
  }

  test("xml source round-trips (Spark 4 built-in)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-xml").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.option("rootTag", "rows").option("rowTag", "row").format("xml").save(s"$base/x")
    val back = spark.read.option("rowTag", "row").format("xml").load(s"$base/x")
    back.count() shouldBe 2
    back.columns.sorted shouldBe Array("id", "name")
  }
}
