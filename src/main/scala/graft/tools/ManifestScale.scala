package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.MinHashLsh
import graft.streaming.Streaming

/** Scale demonstration for the immutable manifest-selected snapshot
  * layer (r15): what reader isolation COSTS at a 1M-row persisted
  * table, and that under the immutable protocol a live reader racing a
  * commit storm is never torn AND never refused — pinned paths do not
  * move, so every read is single-attempt.
  *
  * The claims under measurement:
  *  1. the per-batch mutation cost is O(touched), with NO table-wide
  *     listing anywhere: the merge's existing-rows read resolves the
  *     touched shard's files straight from the committed manifest
  *     (readCommittedDirs) — the r14 protocol paid ~2.3 s/batch in
  *     Spark's pre-pruning table-wide file listing at 500 dirs;
  *  2. the PINNED READ (readCommitted: latest-manifest resolve + one
  *     existence probe per directory + explicit-file-list scan) must
  *     cost within noise of the plain directory scan — snapshot
  *     isolation as a near-free default, not a tax;
  *  3. under a COMMIT STORM (single-shard upserts back to back) a
  *     concurrent reader thread sees ONLY complete committed
  *     generations (per-generation row counts are all distinct here,
  *     so a torn read cannot masquerade as a complete one), with
  *     residual == 0: the retry channel the r14 rename-based swap
  *     needed is gone, because no pinned path ever moves inside the
  *     retention horizon (ManifestKeep generations).
  *
  * Usage: runMain graft.tools.ManifestScale [rows] [batches]
  *
  * MEASURED (1M rows, 500 shard dirs, local[32], r15 final — delta
  * manifests + per-file row-count stats): build+write 8.8 s;
  * full-relist bootstrap commit 5.3 s (the one O(table) manifest op
  * left, paid once per rebuild: a parquet-FOOTER read per file for
  * the row-count stats — mutation commits read footers only for their
  * own staged files); pinned read 1.69 s vs plain directory read
  * 1.90 s (min of 3 — parity within noise); commit storm of 20
  * single-shard upserts at 1.53 s/batch (vs 2.3 s/batch under the r14
  * directory-swap protocol — the table-wide listing floor is gone;
  * what remains is the merge's own shuffle + commit bookkeeping incl.
  * O(batch) footer reads) with a live reader: 21 successful pinned
  * reads, torn=0, residual=0 — every read landed single-attempt on a
  * complete committed generation. Manifest economics at the same
  * table: the one checkpoint is 44 KB, the deltas 162 B each —
  * commit text I/O is O(batch) off-checkpoint.
  */
object ManifestScale {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Session.driverLocal(cpus, "graft-scale-tool")
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val v = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[manifest-scale] $name%-38s sec=$s%.3f")
      (v, s)
    }

    // 500 shard dirs: enough directories that an O(table) term hiding
    // anywhere in the mutation path is measurable (at 10 dirs
    // everything costs ~20 ms and the comparison says nothing)
    val shardSize = math.max(rows / 500, 1L)
    val target = Files.createTempDirectory("graft-manifest-scale").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def mk(lo: Long, hi: Long, batchId: Long) =
      MinHashLsh.withShard(
        spark.range(lo, hi).select(
          col("id").as("doc_id"),
          concat(lit("payload-"), col("id")).as("payload"),
          lit(batchId).as("batch_id")),
        "doc_id", shardSize)

    time(s"build+write ($rows rows, ${rows / shardSize} shards)") {
      mk(0L, rows, 1L).write.mode("overwrite").partitionBy("shard").parquet(target)
    }
    // bootstrap commit: the one full-relist path left in the protocol
    time("manifest commit, full re-list (bootstrap)") {
      Streaming.writeManifest(fs, target)
    }

    // -- claim 2: pinned read ~ plain read -----------------------------
    def bench(name: String)(read: => org.apache.spark.sql.DataFrame): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        read.agg(count(lit(1)), sum(col("doc_id"))).head()
        (System.nanoTime() - t0) / 1e9
      }
      val best = ts.min
      println(f"[manifest-scale] $name%-38s sec=$best%.3f (min of 3)")
      best
    }
    val plain = bench("plain directory read")(spark.read.parquet(target))
    val pinned = bench("pinned read (readCommitted)")(Streaming.readCommitted(spark, target))
    println(f"[manifest-scale] isolation overhead: ${pinned - plain}%.3f s " +
      f"(${100.0 * (pinned - plain) / plain}%.1f%%)")

    // -- claims 1 + 3: commit storm with a live reader ------------------
    // each batch rewrites ONE shard and adds one brand-new doc, so the
    // complete generations have strictly increasing, distinct counts
    val torn = new java.util.concurrent.atomic.AtomicInteger(0)
    val ok = new java.util.concurrent.atomic.AtomicInteger(0)
    val residual = new java.util.concurrent.atomic.AtomicInteger(0)
    val validCounts = (0 to batches).map(i => rows + i).toSet
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop) {
        try {
          val n = Streaming.readCommitted(spark, target).count()
          if (validCounts.contains(n)) ok.incrementAndGet() else torn.incrementAndGet()
        } catch { case _: Throwable => residual.incrementAndGet() }
      }
    }, "manifest-scale-reader")
    reader.start()
    val (_, stormSec) = time(s"commit storm ($batches single-shard upserts)") {
      for (i <- 1 to batches)
        Streaming.upsertPartitionedBatch(target, "doc_id", "batch_id", "shard")(
          mk(rows + i - 1, rows + i, 1L + i), 1L + i)
    }
    stop = true
    reader.join(30000)
    println(f"[manifest-scale] per-batch=${stormSec / batches}%.2f s; " +
      s"reader: ok=${ok.get()} torn=${torn.get()} residual=${residual.get()}")
    require(torn.get() == 0, s"TORN READS: ${torn.get()} — snapshot isolation broke")
    require(residual.get() == 0,
      s"RESIDUAL REFUSALS: ${residual.get()} — the immutable protocol must be single-attempt")
    require(ok.get() > 0, "reader starved — no successful pinned reads during the storm")
    val finalN = Streaming.readCommitted(spark, target).count()
    require(finalN == rows + batches, s"final count $finalN != ${rows + batches}")
    // manifest ECONOMICS: most commits write an O(batch) delta; a full
    // checkpoint lands every CheckpointEvery generations — the ratio
    // of the two sizes is the Delta-log claim, printed as evidence
    val mdir = Streaming.manifestDir(target)
    val stats = fs.listStatus(mdir).map(st => (st.getPath.getName, st.getLen))
    def tot(prefix: String) = stats.filter(_._1.startsWith(prefix))
    val ck = tot("gen-"); val inc = tot("inc-")
    println(f"[manifest-scale] manifest dir: ${ck.length} checkpoints " +
      f"(max ${if (ck.isEmpty) 0L else ck.map(_._2).max} B), ${inc.length} deltas " +
      f"(max ${if (inc.isEmpty) 0L else inc.map(_._2).max} B) — commit text I/O is " +
      "O(batch) off-checkpoint")
    println(s"[manifest-scale] final pinned read: $finalN rows — PASS")
    spark.stop()
  }
}
