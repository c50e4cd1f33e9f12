package graft.tools


import graft.SparkEntry

/** Plan-inspection CLI: print the formatted physical plan (and
  * optionally time a noop-sink execution) for named queries.
  *
  * Usage: runMain graft.tools.Explain <sfDir> [time] <query...|all>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val rest = args.drop(1).toList
    val (doTime, names0) = rest match {
      case "time" :: tail => (true, tail)
      case other          => (false, other)
    }
    val names =
      if (names0.isEmpty || names0 == List("all")) SparkEntry.queries.keys.toSeq.sorted
      else names0

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Session.driverLocal: the production dialect, one source of truth
    val spark = graft.core.Session.driverLocal(cpus, "graft-explain")
    spark.sparkContext.setLogLevel("WARN")

    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"\n========== $name ==========")
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      if (doTime) {
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        println(f"[time] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // after the action the adaptive plan is final — this is where
        // AQE's runtime join elections (broadcast vs shuffle) show up,
        // which the pre-execution formatted plan above cannot
        println("---------- final adaptive plan ----------")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
