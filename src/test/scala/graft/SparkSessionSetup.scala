package graft

import org.apache.spark.sql.SparkSession

/** One shared local session per JVM for all suites (reference pattern:
  * src/test/scala/io/opentargets/etl/backend/SparkSessionSetup.scala).
  */
trait SparkSessionSetup {
  lazy val spark: SparkSession = SparkSessionSetup.shared
  val sfDir = "/root/testdata/sf0.001"
}

object SparkSessionSetup {
  lazy val shared: SparkSession = graft.core.Session.local(cores = 4, appName = "graft-test")
}
