package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver keeps only the LAST 2000 bytes of bench stdout and sbt
  * appends a "[success] Total time: ..." line (~80 bytes) after ours.
  * If the bench JSON line outgrows ~1920 bytes it is head-truncated and
  * the driver records parsed=null (this happened in rounds 1 and 2).
  * Guard the compact stdout form at worst-case timing widths so adding
  * queries fails HERE instead of silently in the driver.
  */
class BenchLineSpec extends AnyFunSuite {

  test("compact bench line fits the driver tail with headroom for sbt's trailer") {
    // widest case per band: "9.9" (3), "99" (2), "123" (3) — every
    // band renders at most 3 chars below 1000s/query. The top-N cap
    // makes the length independent of registry size: check with the
    // real registry AND a 300-query synthetic one.
    val registries = Seq(
      SparkEntry.queries.keys.toSeq.sorted,
      (1 to 300).map(i => f"q_synthetic_query_with_a_long_name_$i%03d")
    )
    for (names <- registries; worst <- Seq(9.94, 99.4, 123.45)) {
      val results = names.map(_ -> worst)
      // cpu at 32 in-process cores can reach ~32x wall — 4-digit values
      val cpus = names.map(_ -> worst * 32)
      // pw at its realistic worst: every whitelisted query warned, two
      // digits each (retry passes double the count)
      val pw = graft.plans.PlanContracts.globalWindowWhitelist.toSeq.sorted.map(_ -> 12)
      val line = Bench.renderLine(9999.99, results, Nil, "/root/testdata/sf0.1",
        compact = true, loads = Seq(123.9, 123.9), cpus = cpus, pw = pw,
        jitSec = 999.9, gcSec = 99.9, ccMb = 511.9)
      assert(line.length <= 1880, s"bench stdout line is ${line.length} bytes at $worst s/query " +
        s"x ${names.size} queries; driver tail keeps 2000 and sbt's trailer needs ~80")
    }
  }

  test("compact cpu array aligns with the queries object's key order") {
    val names = (1 to 40).map(i => f"q_q$i%02d")
    // q_q01 slowest ... q_q40 fastest; cpu = 10x wall so values are
    // distinguishable in the output
    val results = names.zipWithIndex.map { case (n, i) => n -> (40.0 - i) }
    val cpus = results.map { case (n, w) => n -> w * 10 }
    val line = Bench.renderLine(1.0, results, Nil, "sf", compact = true, cpus = cpus)
    val keys = "\"(q\\d+)\":".r.findAllMatchIn(
      line.substring(line.indexOf("\"queries\":"))).map(_.group(1)).toSeq
    val cpuArr = "\"cpu\":\\[([^\\]]*)\\]".r.findFirstMatchIn(line).get.group(1)
      .split(",").map(_.toDouble).toSeq
    assert(keys.size == Bench.CompactTopN && cpuArr.size == keys.size)
    // kept = slowest 32 sorted by name: q_q01..q_q32, wall 40..9,
    // cpu exactly 10x each — zip and check the pairing survived
    val wallByKey = results.map { case (n, w) => n.stripPrefix("q_") -> w }.toMap
    keys.zip(cpuArr).foreach { case (k, c) =>
      assert(math.abs(c - wallByKey(k) * 10) < 1.0, s"cpu misaligned at $k: $c")
    }
    // NaN cpu (no MXBean) must drop the field, not emit invalid JSON
    val withNaN = Bench.renderLine(1.0, results, Nil, "sf", compact = true,
      cpus = results.map { case (n, _) => n -> Double.NaN })
    assert(!withNaN.contains("cpu"))
    assert(!withNaN.contains("NaN"))
  }

  test("load1 marker reads on this platform and is omitted when unreadable") {
    // /proc/loadavg exists on every Linux target; elsewhere load1()
    // yields NaN and the marker must VANISH (NaN is not valid JSON —
    // a malformed line would zero the whole bench record)
    val l = Bench.load1()
    assert(l.isNaN || l >= 0.0)
    val withLoads = Bench.renderLine(1.0, Seq("q_x" -> 1.0), Nil, "sf",
      compact = true, loads = Seq(1.25, 2.0))
    assert(withLoads.contains(""""load1":[1.3,2.0]"""))
    val withNaN = Bench.renderLine(1.0, Seq("q_x" -> 1.0), Nil, "sf",
      compact = true, loads = Seq(Double.NaN, 2.0))
    assert(!withNaN.contains("load1"))
    assert(!withNaN.contains("NaN"))
  }

  test("compact line keeps the slowest CompactTopN queries and counts the omitted tail") {
    val names = (1 to 60).map(i => f"q_q$i%02d")
    // q_q01 slowest ... q_q60 fastest
    val results = names.zipWithIndex.map { case (n, i) => n -> (60.0 - i) }
    val line = Bench.renderLine(1.0, results, Nil, "sf", compact = true)
    assert(line.contains("\"q01\":"))
    assert(line.contains(s""""q${Bench.CompactTopN}":"""))
    assert(!line.contains(s""""q${Bench.CompactTopN + 1}":"""))
    assert(line.contains(s""""omitted":${60 - Bench.CompactTopN}"""))
  }

  test("compact values keep error small in every band (rel <= 5% or abs <= 50ms)") {
    for (v <- Seq(0.123, 1.234, 9.876, 12.34, 98.76, 123.4, 987.6)) {
      val line = Bench.renderLine(v, Seq("q_x" -> v), Nil, "sf", compact = true)
      val rendered = "\"x\":([0-9.]+)".r.findFirstMatchIn(line).get.group(1).toDouble
      val abs = math.abs(rendered - v)
      assert(abs / v <= 0.05 || abs <= 0.05, s"$v rendered as $rendered")
    }
  }

  test("compact line keys are q_-stripped registry names; kept + omitted covers the registry") {
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 1.0)
    val line = Bench.renderLine(1.0, results, Nil, "/root/testdata/sf0.1", compact = true)
    val queriesObj = line.substring(line.indexOf("\"queries\":{") + 11, line.indexOf("}"))
    val keptKeys = "\"([a-z0-9_]+)\":".r.findAllMatchIn(queriesObj).map(_.group(1)).toSet
    val strippedRegistry = SparkEntry.queries.keys.map(_.stripPrefix("q_")).toSet
    assert(keptKeys.subsetOf(strippedRegistry), s"unknown keys: ${keptKeys -- strippedRegistry}")
    val omitted = "\"omitted\":(\\d+)".r.findFirstMatchIn(line).map(_.group(1).toInt).getOrElse(0)
    assert(keptKeys.size + omitted == SparkEntry.queries.size)
    assert(!line.contains("\"errors\""))
    assert(line.contains("\"sf\":\"sf0.1\""))
  }

  test("full line keeps original q_ names and 3-decimal precision") {
    val results = Seq("q_x" -> 1.2345)
    val line = Bench.renderLine(1.2345, results, Seq("q_y: Boom"), "/root/testdata/sf0.1", compact = false)
    assert(line.contains("\"q_x\":1.234") || line.contains("\"q_x\":1.235"))
    assert(line.contains("\"errors\":[\"q_y: Boom\"]"))
    assert(line.contains("\"sf\":\"/root/testdata/sf0.1\""))
  }
}
