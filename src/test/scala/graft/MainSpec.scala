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

  test("two-step pipeline: step 2 reads step 1's written output via a step reference") {
    // The reference's inter-step contract (reference.conf:118,
    // interaction.input.targets = ${steps.target.output.target}):
    // step 1 dedups the events table and writes it as a derived
    // `events.parquet`; step 2's sfDir resolves to step 1's output
    // directory, so its windowed aggregation runs over the DEDUPED
    // table, not the raw one.
    val out = Files.createTempDirectory("graft-pipe").toString
    val cfg = Config.fromJsonString(
      s"""{"appName":"t","steps":[
            {"name":"dedup","query":"q_dedup_latest_wins",
             "sfDir":"$sfDir","output":{"path":"$out/derived/events.parquet"}},
            {"name":"distinct_users","query":"q_agg_approx_distinct_bounded",
             "sfDir":"$${steps.dedup.output.dir}","output":{"path":"$out/final"}}]}"""
    )
    cfg.steps(1).sfDir shouldBe s"$out/derived"
    cfg.steps.foreach(Main.runStep(spark, _))
    val derived = spark.read.parquet(s"$out/derived/events.parquet")
    val finalOut = spark.read.parquet(s"$out/final")
    // step 2 consumed step 1's output: after latest-wins dedup every
    // user has exactly one event, so n_exact per type sums to the
    // derived row count (it would exceed it against the raw table)
    finalOut.count() should be > 0L
    import org.apache.spark.sql.functions.sum
    finalOut.agg(sum("n_exact")).head.getLong(0) shouldBe derived.count()
  }

  test("step references to unknown or later steps fail fast at parse time") {
    an[IllegalArgumentException] should be thrownBy Config.fromJsonString(
      """{"steps":[{"name":"b","query":"q_dedup_exact",
           "sfDir":"${steps.nope.output.dir}","output":{"path":"/o"}}]}"""
    )
  }

  test("unknown step query fails fast") {
    val cfg = Config.fromJsonString(
      """{"steps":[{"name":"x","query":"q_nope","sfDir":"/d","output":{"path":"/o"}}]}"""
    )
    an[IllegalArgumentException] should be thrownBy Main.runStep(spark, cfg.steps.head)
  }

  test("Session.build applies spark.sql.mapKeyDedupPolicy=LAST_WIN (literature session)") {
    // The reference's literature step rebuilds its session with
    // LAST_WIN so duplicate map keys fold to the last value
    // (reference.conf:709-712, literature/Literature.scala:18-31) —
    // Spark's default policy EXCEPTION would kill the step instead. A
    // user porting that step passes the same k/v pair through
    // Session.build's extraConf; mapKeyDedupPolicy is a RUNTIME conf,
    // so getOrCreate applies it to the already-running session.
    import org.apache.spark.sql.functions._
    val before = spark.conf.getOption("spark.sql.mapKeyDedupPolicy")
    try {
      val s = graft.core.Session.build(
        appName = "graft-literature",
        extraConf = Map("spark.sql.mapKeyDedupPolicy" -> "LAST_WIN")
      )
      (s eq spark) shouldBe true // same shared session, conf applied
      val m = s.range(1)
        .select(map_from_arrays(
          array(lit("k"), lit("k")), array(lit(1), lit(2))).as("m"))
        .select(element_at(col("m"), "k"))
        .head().getInt(0)
      m shouldBe 2 // LAST_WIN keeps the later value
      // and the default policy really is the throwing one (the spec
      // would be vacuous if Spark folded duplicates anyway)
      s.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
      an[Exception] should be thrownBy s.range(1)
        .select(map_from_arrays(
          array(lit("k"), lit("k")), array(lit(1), lit(2))).as("m"))
        .head()
    } finally before match {
      case Some(v) => spark.conf.set("spark.sql.mapKeyDedupPolicy", v)
      case None    => spark.conf.unset("spark.sql.mapKeyDedupPolicy")
    }
  }

  test("the BPE oracle VALUES LUT stays LUT-sized (registration-time replay guard)") {
    // The oracle for q_text_bpe_tokenize inlines a (token -> pieces)
    // VALUES row per vocabulary word, encoded driver-side at query
    // registration — sound only while the vocabulary is small. The
    // builder require()s <= 4096 entries; this pins the CURRENT size
    // well under it so growth is a deliberate, reviewed change.
    val sql = SparkEntry.oracleSql("q_text_bpe_tokenize")
    val rows = "\\('[^']*', \\d+\\)".r.findAllIn(sql).size
    rows should be > 0
    rows should be <= 4096
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
