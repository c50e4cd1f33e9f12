package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._

import graft.SparkEntry

/** Stage-level profile of a registry query: run it once against the
  * noop sink and print, per stage, wall span, task count, summed task
  * executorRunTime / executorCpuTime / GC / shuffle bytes — the
  * breakdown the Spark UI would show, captured headlessly so the
  * optimization round can attribute a query's process-CPU to stages
  * instead of guessing (guide §1.1/§7.1).
  *
  * Usage: runMain graft.tools.QueryProfile <sfDir> <query...>
  * Env: SPARK_GRAFT_CPUS (default 4).
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toList
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Session.driverLocal(cpus, "graft-profile")
    spark.sparkContext.setLogLevel("WARN")
    // A/B knob for profiling runs: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    // applied via runtime conf (only runtime-settable keys).
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach { kvs =>
      kvs.split(";").filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      }
    }

    final case class St(
        var name: String = "",
        var tasks: Int = 0,
        var runMs: Long = 0,
        var cpuNs: Long = 0,
        var gcMs: Long = 0,
        var shufReadB: Long = 0,
        var shufWriteB: Long = 0,
        var inputB: Long = 0,
        var resultSerMs: Long = 0,
        var deserMs: Long = 0,
        var schedDelayMs: Long = 0,
        var firstLaunch: Long = Long.MaxValue,
        var lastFinish: Long = 0)
    val stages = mutable.LinkedHashMap.empty[Int, St]
    val listener = new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stages.synchronized {
          stages.getOrElseUpdate(e.stageInfo.stageId, St()).name =
            e.stageInfo.name.takeWhile(_ != '\n').take(80)
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = stages.synchronized {
        val s = stages.getOrElseUpdate(e.stageId, St())
        val m = e.taskMetrics
        val i = e.taskInfo
        if (m != null && i != null) {
          s.tasks += 1
          s.runMs += m.executorRunTime
          s.cpuNs += m.executorCpuTime
          s.gcMs += m.jvmGCTime
          s.shufReadB += m.shuffleReadMetrics.totalBytesRead
          s.shufWriteB += m.shuffleWriteMetrics.bytesWritten
          s.inputB += m.inputMetrics.bytesRead
          s.resultSerMs += m.resultSerializationTime
          s.deserMs += m.executorDeserializeTime
          s.firstLaunch = math.min(s.firstLaunch, i.launchTime)
          s.lastFinish = math.max(s.lastFinish, i.finishTime)
          val span = i.finishTime - i.launchTime
          s.schedDelayMs += math.max(0L,
            span - m.executorRunTime - m.executorDeserializeTime - m.resultSerializationTime)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val c0 = graft.Bench.processCpuNanos()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (graft.Bench.processCpuNanos() - c0) / 1e9
      // drain listener events before reading (the bus is private API;
      // a short sleep suffices for a profiling tool)
      Thread.sleep(500)
      println(f"\n===== $name wall=$wall%.2f s processCpu=$cpu%.1f s =====")
      println(f"${"stage"}%6s ${"tasks"}%5s ${"span_s"}%7s ${"run_s"}%7s ${"cpu_s"}%7s " +
        f"${"gc_s"}%5s ${"sched_s"}%7s ${"deser_s"}%7s ${"shufR"}%8s ${"shufW"}%8s  name")
      val snap = stages.synchronized(stages.toSeq.sortBy(_._1))
      var (tRun, tCpu, tGc, tSched, tDeser) = (0L, 0L, 0L, 0L, 0L)
      snap.foreach { case (id, s) =>
        val span = if (s.lastFinish > 0) (s.lastFinish - s.firstLaunch) / 1e3 else 0.0
        println(f"$id%6d ${s.tasks}%5d $span%7.2f ${s.runMs / 1e3}%7.2f ${s.cpuNs / 1e9}%7.2f " +
          f"${s.gcMs / 1e3}%5.2f ${s.schedDelayMs / 1e3}%7.2f ${s.deserMs / 1e3}%7.2f " +
          f"${s.shufReadB / 1024}%7dK ${s.shufWriteB / 1024}%7dK  ${s.name}")
        tRun += s.runMs; tCpu += s.cpuNs / 1000000; tGc += s.gcMs
        tSched += s.schedDelayMs; tDeser += s.deserMs
      }
      println(f"TOTAL tasks=${snap.map(_._2.tasks).sum} run=${tRun / 1e3}%.1f s " +
        f"taskCpu=${tCpu / 1e3}%.1f s gc=${tGc / 1e3}%.1f s sched=${tSched / 1e3}%.1f s " +
        f"deser=${tDeser / 1e3}%.1f s stages=${snap.size}")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
