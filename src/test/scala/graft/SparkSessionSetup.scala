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
  lazy val shared: SparkSession = graft.core.Session.build(
    appName = "graft-test",
    master = Some("local[4]"),
    extraConf = Map(
      "spark.sql.shuffle.partitions" -> "4",
      "spark.ui.enabled" -> "false",
      // static conf: table specs (bucketing tests) land in a temp dir
      "spark.sql.warehouse.dir" ->
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    )
  )
}
