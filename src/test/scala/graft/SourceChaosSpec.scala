package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core.{Io, IoConfig}

/** SOURCE-LEVEL hostile input — the ingest classes the parquet-table
  * chaos gate (tools/chaos_check.py) cannot reach, because real 100-TB
  * inputs are not well-formed parquet: they are CSV/JSONL crawls with
  * corrupt lines, schemas that drift across files, and truncated
  * compressed blobs. The reference reads exactly such inputs with
  * per-resource option lists and inferSchema everywhere
  * (reference.conf:33-38,60-104; IoHelpers.scala:57-72) and never
  * states a malformed-record policy — this spec pins OURS, per class,
  * on the config-driven Io.read path:
  *
  *  - corrupt JSONL/CSV lines: PERMISSIVE carries them (nulls + the
  *    raw line in columnNameOfCorruptRecord — auditable quarantine),
  *    DROPMALFORMED drops them silently, FAILFAST kills the read;
  *    pick per resource, no stage ever dies by default;
  *  - schema drift across files: JSON unions fields (absent -> NULL),
  *    parquet merges schemas under mergeSchema=true;
  *  - type conflict under inference: CSV inferSchema falls back to
  *    string rather than guessing a side;
  *  - truncated gzip: poisons the whole read by default (FAILFAST-like
  *    — compression damage is not row-granular), and with
  *    ignoreCorruptFiles=true degrades to readable-prefix semantics
  *    without losing intact files.
  */
class SourceChaosSpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  private def writeLines(path: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  private val jsonDdl = "id BIGINT, name STRING, _bad STRING"

  private def jsonlFixture(): String = {
    val root = Files.createTempDirectory("graft-src-chaos").toString
    writeLines(s"$root/data/part-0.jsonl", Seq(
      """{"id": 1, "name": "alpha"}""",
      """{"id": 2, "name": "beta"}""",
      """{broken json line""",
      """{"id": "not-a-number", "name": "gamma"}""",
      """not json at all"""))
    root
  }

  test("corrupt JSONL under PERMISSIVE: good rows parse, bad lines are quarantined, nothing dies") {
    val root = jsonlFixture()
    val df = Io.read(spark, IoConfig("json", s"$root/data/*.jsonl", Map(
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> "_bad"), schemaDdl = Some(jsonDdl)))
    val rows = df.collect()
    rows.length shouldBe 5
    // parsed rows carry data and a NULL quarantine column
    rows.filter(_.getAs[String]("_bad") == null)
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("name"))).toSet shouldBe
      Set((1L, "alpha"), (2L, "beta"))
    // quarantined rows carry the RAW line (auditable + replayable) and
    // NULL data columns — including the type-mismatch row, which is
    // malformed RELATIVE TO THE SCHEMA, not just unparseable text
    val bad = rows.filter(_.getAs[String]("_bad") != null)
    bad.length shouldBe 3
    bad.map(_.getAs[String]("_bad")).toSet shouldBe Set(
      """{broken json line""",
      """{"id": "not-a-number", "name": "gamma"}""",
      """not json at all""")
    bad.foreach { r => r.isNullAt(r.fieldIndex("id")) shouldBe true }
  }

  test("corrupt JSONL under DROPMALFORMED and FAILFAST: the other two per-resource policies") {
    val root = jsonlFixture()
    // DROPMALFORMED's drop is STRUCTURAL: the two unparseable lines
    // vanish, but the type-mismatch record — valid JSON whose `id`
    // fails the declared BIGINT — survives as a partial row with the
    // bad field nulled (measured Spark 4 behavior, pinned here: a
    // pipeline that needs type-mismatches quarantined must use
    // PERMISSIVE + columnNameOfCorruptRecord, as the test above does)
    val dropped = Io.read(spark, IoConfig("json", s"$root/data/*.jsonl", Map(
      "mode" -> "DROPMALFORMED"), schemaDdl = Some("id BIGINT, name STRING")))
    val keptRows = dropped.collect()
    keptRows.map(r => r.getAs[String]("name")).toSet shouldBe Set("alpha", "beta")
    // ...AND the 100-TB observability trap, pinned: count() on the
    // same read says THREE — a count-only plan skips field conversion,
    // so the type-mismatch record is only "malformed" when its fields
    // are actually materialized. Audits of DROPMALFORMED survivors
    // must count a materialized projection, never the bare scan.
    dropped.count() shouldBe 3

    val strict = Io.read(spark, IoConfig("json", s"$root/data/*.jsonl", Map(
      "mode" -> "FAILFAST"), schemaDdl = Some("id BIGINT, name STRING")))
    val e = intercept[org.apache.spark.SparkException] { strict.collect() }
    // the malformed-record cause is down the chain (the top frame is
    // the generic FAILED_READ_FILE wrapper)
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.toLowerCase.contains("malformed"))) shouldBe true
  }

  test("JSONL schema drift across files: later fields union in, absent fields read NULL") {
    val root = Files.createTempDirectory("graft-src-drift").toString
    writeLines(s"$root/a/part-0.jsonl", Seq(
      """{"id": 1, "name": "alpha"}""",
      """{"id": 2, "name": "beta"}"""))
    writeLines(s"$root/b/part-0.jsonl", Seq(
      """{"id": 3, "name": "gamma", "extra": 7.5}"""))
    val df = Io.read(spark, IoConfig("json", s"$root/{a,b}/*.jsonl"))
    df.schema.fieldNames.toSet shouldBe Set("id", "name", "extra")
    df.count() shouldBe 3
    df.filter(col("extra").isNull).count() shouldBe 2
    df.filter(col("id") === 3).select(col("extra")).head.getDouble(0) shouldBe 7.5
  }

  test("parquet schema drift: mergeSchema unions columns across files") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-src-pq").toString
    Seq((1L, "alpha")).toDF("id", "name").write.parquet(s"$root/p1")
    Seq((2L, 0.5)).toDF("id", "score").write.parquet(s"$root/p2")
    val merged = Io.read(spark,
      IoConfig("parquet", s"$root/p*", Map("mergeSchema" -> "true")))
    merged.schema.fieldNames.toSet shouldBe Set("id", "name", "score")
    merged.count() shouldBe 2
    merged.filter(col("id") === 1).select(col("score")).head.isNullAt(0) shouldBe true
  }

  test("CSV type conflict under inferSchema falls back to string; declared schema quarantines") {
    val root = Files.createTempDirectory("graft-src-csv").toString
    writeLines(s"$root/data/part-0.csv", Seq(
      "id,qty",
      "1,10",
      "2,not-a-number",
      "3,30"))
    // inference: a column that is int in some rows and text in others
    // must come back STRING with every row intact — never a guess that
    // silently nulls the minority rows
    val inferred = Io.read(spark, IoConfig("csv", s"$root/data/*.csv", Map(
      "header" -> "true", "inferSchema" -> "true")))
    inferred.schema("qty").dataType shouldBe StringType
    inferred.count() shouldBe 3
    // declared schema: the mismatch row is malformed -> PERMISSIVE
    // nulls the bad cell and quarantines the raw line
    val declared = Io.read(spark, IoConfig("csv", s"$root/data/*.csv", Map(
      "header" -> "true", "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> "_bad"),
      schemaDdl = Some("id BIGINT, qty BIGINT, _bad STRING")))
    val rows = declared.collect()
    rows.length shouldBe 3
    val bad = rows.filter(_.getAs[String]("_bad") != null)
    bad.map(_.getAs[String]("_bad")).toSeq shouldBe Seq("2,not-a-number")
    bad.head.isNullAt(bad.head.fieldIndex("qty")) shouldBe true
    rows.filter(_.getAs[String]("_bad") == null)
      .map(_.getAs[Long]("qty")).toSet shouldBe Set(10L, 30L)
  }

  test("truncated gzip: poisons the read by default, ignoreCorruptFiles keeps intact files") {
    val root = Files.createTempDirectory("graft-src-gz").toString
    Files.createDirectories(Paths.get(s"$root/data"))
    // an INTACT gz member file
    def gz(path: String, lines: Seq[String]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      g.close()
      val bytes = bos.toByteArray
      Files.write(Paths.get(path), bytes)
      bytes
    }
    gz(s"$root/data/good.jsonl.gz",
      (1 to 5).map(i => s"""{"id": $i, "name": "good-$i"}"""))
    // a TRUNCATED gz member: half the compressed bytes (mid-stream cut
    // — the upload-died-at-99% class)
    val full = gz(s"$root/data/tmp.gz", (1 to 100).map(i => s"""{"id": ${i + 100}}"""))
    Files.delete(Paths.get(s"$root/data/tmp.gz"))
    Files.write(Paths.get(s"$root/data/bad.jsonl.gz"), full.take(full.length / 2))

    // the damaged member kills the read AT FIRST TOUCH — schema
    // inference already scans the gz, so even load() dies. Compression
    // damage is not row-granular: there is no honest PERMISSIVE row to
    // emit, and surfacing beats silently shipping a partial corpus
    intercept[org.apache.spark.SparkException] {
      Io.read(spark, IoConfig("json", s"$root/data/*.jsonl.gz")).collect()
    }

    // opt-in degraded mode — and its PRECONDITION, pinned: the
    // ignoreCorruptFiles conf only governs the SCAN, so it rescues the
    // read only when the schema is DECLARED. (Inference scans the
    // files before any of this and dies on the damaged member — the
    // intercept above covers it.) With a declared schema the intact
    // file's rows all survive and the truncated member contributes at
    // most its readable prefix.
    val rows = try {
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
      Io.read(spark, IoConfig("json", s"$root/data/*.jsonl.gz",
        schemaDdl = Some("id BIGINT, name STRING"))).collect()
    } finally spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    rows.map(_.getAs[String]("name")).filter(_ != null).toSet shouldBe
      (1 to 5).map(i => s"good-$i").toSet
    // the damaged member (ids > 100) yields a readable PREFIX, never
    // invented rows
    val fromBad = rows.filter(r => !r.isNullAt(r.fieldIndex("id")) && r.getAs[Long]("id") > 100)
      .map(_.getAs[Long]("id"))
    fromBad.length should be < 100
    fromBad.sorted shouldBe (101L until (101L + fromBad.length)).toArray
  }

  test("corrupt parquet member: fails loudly by default, ignoreCorruptFiles skips FILE-granular") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-src-badpq").toString
    (1 to 5).map(i => (i.toLong, s"good-$i")).toDF("id", "name")
      .coalesce(1).write.parquet(s"$root/data")
    // a truncated parquet member next to the intact one: cut the
    // footer off a real file so the magic check fails at open — the
    // layer ignoreCorruptFiles DOES wrap (unlike the gzip mid-stream
    // case above)
    val intact = Files.list(Paths.get(s"$root/data")).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    val bytes = Files.readAllBytes(Paths.get(intact))
    Files.write(Paths.get(s"$root/data/part-corrupt.parquet"), bytes.take(bytes.length / 2))

    val strict = Io.read(spark, IoConfig("parquet", s"$root/data"))
    intercept[org.apache.spark.SparkException] { strict.collect() }

    val names = try {
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
      Io.read(spark, IoConfig("parquet", s"$root/data")).collect()
    } finally spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    names.map(_.getAs[String]("name")).toSet shouldBe (1 to 5).map(i => s"good-$i").toSet
  }
}
