ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "platformetlbackendspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The forked run's stdout must reach the console VERBATIM: sbt's default
// LoggedOutput prepends "[info] " to every stdout line, which breaks
// downstream JSON parsing of the one-line bench/verify results (the
// harness JSON-parses the line as captured). StdoutOutput passes the
// child's stdout/stderr straight through, unprefixed.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Whole-stage codegen emits one+ compiled class per query stage; at
  // 140+ registry queries a full Verify/Bench run outgrows the JDK17
  // default 240m reserved code cache, and UseCodeCacheFlushing then
  // sweeps HOT compiled methods mid-run — later queries pay re-JIT
  // inside their timed window (the bimodal-cpu mechanism profiled in
  // tools/CascadeProfile; r17 judge #2 measured an untouched query's
  // cpu 13s -> 22-31s as the registry grew). 512m keeps the whole
  // run's code resident.
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // A/B knob for JVM-level measurements (guide §1.1): extra flags for a
  // forked run/test JVM, e.g. SPARK_GRAFT_JVM_EXTRA="-XX:CompileThresholdScaling=5".
  // Defaults to nothing — the driver's bench runs the committed flags above.
  sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
