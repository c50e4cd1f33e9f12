package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.Streaming

/** CHANGE DATA FEED (r18 judge #1): row-level `_change_type` delivery
  * computed from the window's DV sidecars + added files — batch
  * ([[Streaming.readChangeFeed]]) and streaming
  * (`option("readChangeFeed", "true")`), so a subscriber survives a
  * MERGE/UPDATE/DELETE window instead of stalling at the added-files
  * refusal. No reference counterpart; surface mirrors public Delta
  * CDF / Iceberg changelog semantics.
  */
class ChangeFeedSpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("batch readChangeFeed: append=inserts, delete=pre-image rows, " +
      "update=delete+insert pair, each tagged with its generation") {
    import spark.implicits._
    val target = Files.createTempDirectory("graft-cdf-batch").toString + "/t"
    (0 until 100).map(k => (k.toLong, s"p-$k", k.toLong * 10))
      .toDF("id", "payload", "score")
      .write.format("graft").save(target) // gen 1
    val g1 = Streaming.manifestGenerations(fs, target).last
    // pin the pre-window snapshot NOW (g1 ages past the ManifestKeep
    // horizon once three mutations land)
    val snapshotBefore = Streaming.readCommitted(spark, target).localCheckpoint()
    // gen 2: append 5
    (100 until 105).map(k => (k.toLong, s"p-$k", k.toLong * 10))
      .toDF("id", "payload", "score")
      .write.format("graft").mode("append").save(target)
    // gen 3: DV-delete 3 rows
    Streaming.deleteWhere(spark, target, col("id").isin(7L, 8L, 9L)) shouldBe 3L
    // gen 4: update 2 rows (delete old image + insert new image)
    Streaming.updateWhere(spark, target, col("id").isin(11L, 12L),
      Map("payload" -> lit("UPDATED"))) shouldBe 2L
    val g4 = Streaming.manifestGenerations(fs, target).last
    g4 shouldBe g1 + 3

    val feed = Streaming.readChangeFeed(spark, target, g1, g4).get
      .localCheckpoint()
    feed.columns should contain allOf ("_change_type", "_commit_generation")
    // gen 2: exactly the 5 appended rows as inserts
    val w2 = feed.where(col("_commit_generation") === g1 + 1)
    w2.count() shouldBe 5L
    w2.where(col("_change_type") === "insert").count() shouldBe 5L
    w2.agg(min("id"), max("id")).head() match {
      case r => (r.getLong(0), r.getLong(1)) shouldBe (100L, 104L)
    }
    // gen 3: exactly the 3 deleted rows with their FULL pre-images
    val w3 = feed.where(col("_commit_generation") === g1 + 2)
    w3.count() shouldBe 3L
    w3.where(col("_change_type") === "delete").count() shouldBe 3L
    w3.where(col("id") === 7L).select("payload", "score").head() match {
      case r => (r.getString(0), r.getLong(1)) shouldBe ("p-7", 70L)
    }
    // gen 4: 2 deletes (old images) + 2 inserts (new images)
    val w4 = feed.where(col("_commit_generation") === g1 + 3)
    w4.count() shouldBe 4L
    w4.where(col("_change_type") === "delete" && col("id") === 11L)
      .select("payload").head().getString(0) shouldBe "p-11"
    w4.where(col("_change_type") === "insert" && col("id") === 11L)
      .select("payload").head().getString(0) shouldBe "UPDATED"
    // replaying the feed over the pre-window snapshot reconstructs the
    // post-window table exactly (the CDF correctness contract)
    val inserts = feed.where(col("_change_type") === "insert")
      .drop("_change_type", "_commit_generation")
    val deletes = feed.where(col("_change_type") === "delete")
      .drop("_change_type", "_commit_generation")
    // deletes first (they reference pre-window rows), then inserts —
    // the windows here never delete a row inserted in the same feed
    val replayed = snapshotBefore
      .join(deletes.select(col("id").as("__d_id")),
        col("id") === col("__d_id"), "left_anti")
      .unionByName(inserts)
    val now = Streaming.readCommitted(spark, target)
    replayed.count() shouldBe now.count()
    replayed.exceptAll(now).count() shouldBe 0L
  }

  test("readChangeFeed on a MERGE window: retractions and upserts in one " +
      "generation; an empty window returns None") {
    import spark.implicits._
    val target = Files.createTempDirectory("graft-cdf-merge").toString + "/t"
    (0 until 50).map(k => (k.toLong, s"p-$k", k.toLong))
      .toDF("id", "payload", "score")
      .write.format("graft").save(target)
    val g1 = Streaming.manifestGenerations(fs, target).last
    val source = Seq((5L, "M-5", 1L), (6L, "M-6", 2L), (500L, "M-500", 3L))
      .toDF("id", "s_payload", "rank")
    Streaming.mergeInto(spark, target, source, "t.id = s.id",
      whenMatchedUpdate = Some(Map("payload" -> "s.s_payload")),
      whenNotMatchedInsert = Some(Map(
        "payload" -> "s.s_payload", "score" -> "s.rank"))) shouldBe
      Streaming.MergeStats(2L, 1L)
    val g2 = Streaming.manifestGenerations(fs, target).last
    val feed = Streaming.readChangeFeed(spark, target, g1, g2).get.localCheckpoint()
    feed.count() shouldBe 5L // 2 deletes (old images) + 2 updates + 1 insert
    feed.where(col("_change_type") === "delete").select("id")
      .collect().map(_.getLong(0)).sorted shouldBe Array(5L, 6L)
    feed.where(col("_change_type") === "insert").select("id")
      .collect().map(_.getLong(0)).sorted shouldBe Array(5L, 6L, 500L)
    feed.where(col("_change_type") === "insert" && col("id") === 5L)
      .select("payload").head().getString(0) shouldBe "M-5"
    // same-window no-op: identical from/to
    Streaming.readChangeFeed(spark, target, g2, g2) shouldBe None
  }

  test("readChangeFeed REFUSES a file-removing window (compaction is not " +
      "row-attributable) but handles the pre-compaction window fine") {
    import spark.implicits._
    val target = Files.createTempDirectory("graft-cdf-compact").toString + "/t"
    Streaming.upsertPartitionedBatch(target, "id", "v", "shard")(
      (0L until 60L).map(k => (k, k * 2, 1L, k % 3)).toDF("id", "score", "v", "shard"),
      1L)
    val g1 = Streaming.manifestGenerations(fs, target).last
    Streaming.deleteWhere(spark, target, col("id") < 6L) shouldBe 6L
    val g2 = Streaming.manifestGenerations(fs, target).last
    Streaming.readChangeFeed(spark, target, g1, g2).get.count() shouldBe 6L
    // compaction absorbs the DVs by REWRITING files — not attributable
    Streaming.compactShards(spark, target, "shard") should be > 0
    val g3 = Streaming.manifestGenerations(fs, target).last
    val ex = intercept[IllegalStateException] {
      Streaming.readChangeFeed(spark, target, g2, g3)
    }
    ex.getMessage should include("REMOVES")
  }

  test("batch CDF through the connector: option(\"readChangeFeed\") + " +
      "startingGeneration reads the window's change rows; empty windows are " +
      "typed zero-row frames") {
    import spark.implicits._
    val target = Files.createTempDirectory("graft-cdf-conn").toString + "/t"
    (0 until 30).map(k => (k.toLong, s"p-$k")).toDF("id", "payload")
      .write.format("graft").save(target)
    val g1 = Streaming.manifestGenerations(fs, target).last
    Streaming.deleteWhere(spark, target, col("id") < 3L) shouldBe 3L
    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingGeneration", g1.toString)
      .load(target)
    feed.count() shouldBe 3L
    feed.where(col("_change_type") === "delete").select("id")
      .collect().map(_.getLong(0)).sorted shouldBe Array(0L, 1L, 2L)
    // SQL over the feed works (it is a plain relation)
    feed.createOrReplaceTempView("cdf")
    spark.sql("SELECT count(*) AS n FROM cdf WHERE _change_type = 'delete'")
      .head().getLong(0) shouldBe 3L
    // an empty window yields a typed zero-row frame with the CDF schema
    val g2 = Streaming.manifestGenerations(fs, target).last
    val empty = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingGeneration", g2.toString)
      .load(target)
    empty.count() shouldBe 0L
    empty.columns should contain allOf ("_change_type", "_commit_generation", "id")
    // the option without a starting generation refuses loudly
    val ex = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("readChangeFeed", "true").load(target)
    }
    ex.getMessage should include("startingGeneration")
  }

  test("streaming CDF: a subscriber with readChangeFeed SURVIVES a merge window " +
      "exactly-once across restarts, with correct retractions") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-cdf-stream").toString
    val src = base + "/src"
    val out = base + "/out"
    val ck = base + "/ck"
    (0 until 40).map(k => (k.toLong, s"p-$k", k.toLong))
      .toDF("id", "payload", "score")
      .write.format("graft").save(src)
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(src)
        .writeStream.format("parquet")
        .option("checkpointLocation", ck)
        .option("path", out)
        .start()
      try { q.processAllAvailable() } finally q.stop()
    }
    // bootstrap: the snapshot arrives as 40 inserts
    runOnce()
    val snap = spark.read.parquet(out)
    snap.count() shouldBe 40L
    snap.where(col("_change_type") === "insert").count() shouldBe 40L
    // a MERGE lands upstream: the non-CDF source would refuse this
    // window; the CDF subscriber consumes it
    val sourceDf = Seq((3L, "M-3", 0L), (4L, "M-4", 0L), (400L, "M-400", 9L))
      .toDF("id", "s_payload", "rank")
    Streaming.mergeInto(spark, src, sourceDf, "t.id = s.id",
      whenMatchedUpdate = Some(Map("payload" -> "s.s_payload")),
      whenNotMatchedInsert = Some(Map(
        "payload" -> "s.s_payload", "score" -> "s.rank")))
    runOnce()
    val after = spark.read.parquet(out).localCheckpoint()
    after.count() shouldBe 45L // 40 bootstrap + 2 deletes + 3 inserts
    after.where(col("_change_type") === "delete").select("id")
      .collect().map(_.getLong(0)).sorted shouldBe Array(3L, 4L)
    after.where(col("_change_type") === "insert" && col("id") === 400L)
      .count() shouldBe 1L
    // idle restart: nothing redelivered (exactly-once via the
    // checkpointed generation offsets)
    runOnce()
    spark.read.parquet(out).count() shouldBe 45L
    // a plain DELETE window flows too
    Streaming.deleteWhere(spark, src, col("id") === 10L) shouldBe 1L
    runOnce()
    val fin = spark.read.parquet(out)
    fin.count() shouldBe 46L
    fin.where(col("_change_type") === "delete" && col("id") === 10L)
      .select("payload").head().getString(0) shouldBe "p-10"
  }
}
