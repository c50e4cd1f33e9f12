package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.MinHashLsh
import graft.streaming.Streaming

/** The table-to-table CDC composition over the immutable commit
  * protocol: a DERIVED pipeline follows a maintained source table
  * through `Streaming.followTable` — each poll delivers only the rows
  * the source's new commits added (O(delta), never a rescan), the
  * cursor advances durably, redelivery after a crash is absorbed by
  * the consumer's latest-wins merge, and a follower stalled past the
  * retention horizon is refused LOUDLY instead of silently skipping
  * data.
  */
class IncrementalFollowerSpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def sharded(rows: Seq[(Long, String, Long)]): DataFrame = {
    import spark.implicits._
    MinHashLsh.withShard(
      rows.toDF("doc_id", "payload", "batch_id"), "doc_id", shardSize = 50L)
  }

  test("a follower tracks inserts AND updates through commit deltas; the derived table converges") {
    val root = Files.createTempDirectory("graft-follow").toString
    val source = s"$root/source"
    val derived = s"$root/derived"
    val cursor = s"$root/cursor"
    val up = Streaming.upsertPartitionedBatch(
      source, "doc_id", "batch_id", "shard") _

    // the derived pipeline: per-doc payload length, maintained
    // latest-wins keyed like the source (over-delivery is absorbed)
    def applyDelta(delta: DataFrame): Unit =
      Streaming.upsertPartitionedBatch(derived, "doc_id", "batch_id", "shard")(
        delta.select(col("doc_id"), org.apache.spark.sql.functions.length(col("payload")).as("len"),
          col("batch_id"), col("shard")),
        0L)
    def poll(): Long = Streaming.followTable(spark, source, cursor)(applyDelta)
    def derivedMap(): Map[Long, Int] =
      Streaming.readCommitted(spark, derived)
        .select("doc_id", "len").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def expected(): Map[Long, Int] =
      Streaming.readCommitted(spark, source)
        .select(col("doc_id"), org.apache.spark.sql.functions.length(col("payload")).as("len")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap

    // bootstrap: the first poll delivers the full snapshot
    up(sharded((0L until 100L).map(i => (i, s"v1-$i", 1L))), 1L)
    poll() shouldBe 100L
    derivedMap() shouldBe expected()
    // caught up: a poll with no new commits delivers nothing
    poll() shouldBe 0L

    // an INSERT commit delivers only the appended shard's rows
    up(sharded(Seq((200L, "fresh-200", 2L))), 2L)
    poll() shouldBe 1L
    derivedMap() shouldBe expected()

    // an UPDATE commit delivers the touched shard's merged content
    // (file-granular: a superset of the changed keys — 50 rows of
    // shard 0, not 1) and the latest-wins merge converges it
    up(sharded(Seq((7L, "v2-longer-7", 3L))), 3L)
    poll() shouldBe 50L
    derivedMap() shouldBe expected()
    derivedMap()(7L) shouldBe "v2-longer-7".length

    // several commits between polls: one delta covers them all
    up(sharded(Seq((201L, "fresh-201", 4L))), 4L)
    up(sharded(Seq((202L, "fresh-202", 5L))), 5L)
    poll() should be >= 2L
    derivedMap() shouldBe expected()
  }

  test("crash between apply and cursor bump: redelivery converges (at-least-once + latest-wins)") {
    val root = Files.createTempDirectory("graft-follow-crash").toString
    val source = s"$root/source"
    val derived = s"$root/derived"
    val cursor = s"$root/cursor"
    val up = Streaming.upsertPartitionedBatch(source, "doc_id", "batch_id", "shard") _
    def applyDelta(delta: DataFrame): Unit =
      Streaming.upsertPartitionedBatch(derived, "doc_id", "batch_id", "shard")(
        delta.select(col("doc_id"), org.apache.spark.sql.functions.length(col("payload")).as("len"),
          col("batch_id"), col("shard")), 0L)
    up(sharded((0L until 50L).map(i => (i, s"v1-$i", 1L))), 1L)
    Streaming.followTable(spark, source, cursor)(applyDelta) shouldBe 50L
    up(sharded(Seq((100L, "x-100", 2L))), 2L)
    // the crash: apply ran, the cursor bump did not (roll it back)
    Streaming.followTable(spark, source, cursor)(applyDelta) shouldBe 1L
    val out = fs.create(new Path(cursor), true)
    try out.write("1".getBytes("UTF-8")) finally out.close()
    // redelivery of the same range: applied again, result identical
    Streaming.followTable(spark, source, cursor)(applyDelta) shouldBe 1L
    Streaming.readCommitted(spark, derived).count() shouldBe 51L
    Streaming.readCommitted(spark, derived)
      .filter(col("doc_id") === 100L).count() shouldBe 1L
  }

  test("a lagging follower stays CORRECT while its cursor manifest survives; a pruned cursor refuses loudly") {
    val root = Files.createTempDirectory("graft-follow-stall").toString
    val source = s"$root/source"
    val derived = s"$root/derived"
    val cursor = s"$root/cursor"
    val up = Streaming.upsertPartitionedBatch(source, "doc_id", "batch_id", "shard") _
    def applyDelta(delta: DataFrame): Unit =
      Streaming.upsertPartitionedBatch(derived, "doc_id", "batch_id", "shard")(
        delta.select(col("doc_id"), org.apache.spark.sql.functions.length(col("payload")).as("len"),
          col("batch_id"), col("shard")), 0L)
    up(sharded((0L until 50L).map(i => (i, s"v1-$i", 1L))), 1L)
    Streaming.followTable(spark, source, cursor)(applyDelta) shouldBe 50L

    // the source advances past the DATA retention horizon while the
    // follower sleeps (gens 2..5; gen-2's replaced files are GC'd at
    // gen 5) — but the delta is computed purely from manifests and
    // reads ONLY the latest generation's files, so the lagging poll is
    // still CORRECT: intermediate, already-superseded file contents
    // were never needed (latest-wins semantics)
    for (i <- 2 to 5) up(sharded(Seq((1L, s"v$i-1", i.toLong))), i.toLong)
    Streaming.followTable(spark, source, cursor)(applyDelta) should be >= 1L
    Streaming.readCommitted(spark, derived)
      .filter(col("doc_id") === 1L).select("len").head.getInt(0) shouldBe "v5-1".length

    // a cursor whose manifest CHAIN is pruned (a checkpoint landed at
    // or below the cutoff, superseding it as the chain anchor) refuses
    // loudly, never silently skips — the operator re-bootstraps
    for (i <- 6 to 11) up(sharded(Seq((1L, s"v$i-1", i.toLong))), i.toLong)
    // cursor sits at gen 5; latest 11, cutoff 8, checkpoint gen 8 —
    // every manifest below 8 is pruned
    val e = intercept[IllegalStateException] {
      Streaming.followTable(spark, source, cursor)(applyDelta)
    }
    e.getMessage should include("not retained")
  }
}
