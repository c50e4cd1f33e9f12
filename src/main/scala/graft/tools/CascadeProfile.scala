package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Repro harness for the `q_search_index_cascade_scaled` BIMODAL
  * execution profile (r15 verdict, the one `weak` item): cpu 45-49 s
  * in one mode vs 100-219 s in the other across rounds at unchanged
  * code — a plan/stage-level flip, not host noise (cpu is flat under
  * contention). This tool runs the query N times in ONE JVM with a
  * stage-granular listener so both modes are captured side by side
  * and the extra work is ATTRIBUTABLE: per run it prints wall, process
  * cpu, job count, task count, summed executor run time, shuffle
  * bytes, and then a per-stage table (callsite, tasks, run time) for
  * the fastest and slowest runs — the diff between those two tables IS
  * the root cause.
  *
  * Usage: sbt 'runMain graft.tools.CascadeProfile [runs] [sfDir] [query]'
  */
object CascadeProfile {

  final case class StageRow(name: String, tasks: Int, runMs: Long, shuffleReadMb: Double,
      shuffleWriteMb: Double, spillMb: Double)

  final class Recorder extends SparkListener {
    val stages = mutable.ArrayBuffer.empty[StageRow]
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val tm = si.taskMetrics
      stages.synchronized {
        stages += StageRow(
          si.name.linesIterator.next(),
          si.numTasks,
          if (tm == null) 0L else tm.executorRunTime,
          if (tm == null) 0.0 else tm.shuffleReadMetrics.totalBytesRead / 1e6,
          if (tm == null) 0.0 else tm.shuffleWriteMetrics.bytesWritten / 1e6,
          if (tm == null) 0.0 else (tm.memoryBytesSpilled + tm.diskBytesSpilled) / 1e6)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(8)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val qname = args.lift(2).getOrElse("q_search_index_cascade_scaled")
    val spark = graft.core.Session.driverLocal(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-cascade-profile")
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(qname)
    // warmup exactly like Bench
    locally {
      import org.apache.spark.sql.functions._
      val r = spark.range(100000).select(col("id"), (col("id") % 97).as("k"))
      r.groupBy(col("k")).agg(sum(col("id")), count(lit(1)))
        .join(r.limit(100).withColumnRenamed("id", "id2"), "k")
        .write.mode("overwrite").format("noop").save()
    }
    import scala.jdk.CollectionConverters._
    def gcMs(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def jitMs(): Long = java.lang.management.ManagementFactory
      .getCompilationMXBean.getTotalCompilationTime
    def codeCacheMb(): Double = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap")).map(_.getUsage.getUsed / 1e6).sum
    val all = (1 to runs).map { i =>
      val rec = new Recorder
      spark.sparkContext.addSparkListener(rec)
      val t0 = System.nanoTime()
      val c0 = graft.Bench.processCpuNanos()
      val g0 = gcMs(); val j0 = jitMs()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (graft.Bench.processCpuNanos() - c0) / 1e9
      val gcD = (gcMs() - g0) / 1000.0; val jitD = (jitMs() - j0) / 1000.0
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      // drain listener-bus stragglers before detaching
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(rec)
      val tasks = rec.stages.map(_.tasks).sum
      val runMs = rec.stages.map(_.runMs).sum
      println(f"RUN $i%2d wall=$wall%7.2fs cpu=$cpu%7.2fs jobs=${rec.jobs.get()}%3d " +
        f"stages=${rec.stages.size}%3d tasks=$tasks%5d taskTime=${runMs / 1000.0}%8.1fs " +
        f"spill=${rec.stages.map(_.spillMb).sum}%8.1fMB " +
        f"gc=$gcD%6.1fs jit=$jitD%6.1fs codeCache=${codeCacheMb()}%6.1fMB")
      (wall, cpu, rec)
    }
    def dump(tag: String, rec: Recorder): Unit = {
      println(s"==== $tag: per-stage ====")
      rec.stages.sortBy(-_.runMs).take(25).foreach { s =>
        println(f"  ${s.runMs / 1000.0}%8.2fs tasks=${s.tasks}%4d read=${s.shuffleReadMb}%8.1fMB " +
          f"write=${s.shuffleWriteMb}%8.1fMB spill=${s.spillMb}%8.1fMB  ${s.name.take(110)}")
      }
    }
    val byCpu = all.sortBy(_._2)
    dump(f"FASTEST cpu=${byCpu.head._2}%.1fs", byCpu.head._3)
    dump(f"SLOWEST cpu=${byCpu.last._2}%.1fs", byCpu.last._3)
    spark.stop()
  }
}
