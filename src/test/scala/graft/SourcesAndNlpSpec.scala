package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core.{Io, IoConfig}
import graft.functions.{EmbeddingModel, Stemmer}
import graft.sources.FlatFileSource

class SourcesAndNlpSpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  // ------------------------------------------------------------------
  // IO layer (reference IoHelpers.scala surface)
  // ------------------------------------------------------------------

  test("Io round-trips csv with options, json, and gzipped output") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val base = tmpDir("io")

    Io.write(df, IoConfig("csv", s"$base/csv", Map("header" -> "true"), mode = "overwrite"))
    val csv = Io.read(spark, IoConfig("csv", s"$base/csv", Map("header" -> "true", "inferSchema" -> "true")))
    csv.orderBy("id").collect().map(_.getString(1)) shouldBe Array("a", "b")

    Io.write(df, IoConfig("json", s"$base/json", Map("compression" -> "gzip"), mode = "overwrite"))
    Files.list(Paths.get(s"$base/json")).toArray.map(_.toString).count(_.endsWith(".json.gz")) should be > 0
    Io.read(spark, IoConfig("json", s"$base/json")).count() shouldBe 2
  }

  test("Io round-trips ORC with compression (columnar format beyond parquet)") {
    import spark.implicits._
    val df = Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("id", "name", "v")
    val base = tmpDir("orc")
    Io.write(df, IoConfig("orc", s"$base/orc", Map("compression" -> "zlib"), mode = "overwrite"))
    val back = Io.read(spark, IoConfig("orc", s"$base/orc"))
    // ORC reads columns back nullable; names/types must survive
    back.schema.map(f => (f.name, f.dataType)) shouldBe df.schema.map(f => (f.name, f.dataType))
    back.orderBy("id").collect().map(_.getDouble(2)) shouldBe Array(2.5, 3.5)
    // predicate pushdown reaches the ORC scan like parquet
    val plan = back.filter($"id" === 2L).queryExecution.executedPlan.toString
    plan should include("PushedFilters")
  }

  test("parquet schema evolution: mergeSchema unions batch schemas with null padding") {
    import spark.implicits._
    // Two ingestion batches of the same dataset, the later one with an
    // added column — the standard additive-evolution scenario for a
    // long-lived 100 TB table. mergeSchema reconciles at read time;
    // rows from the old batch carry nulls in the new column.
    val base = tmpDir("evolve")
    Seq((1L, "a")).toDF("id", "name")
      .write.parquet(s"$base/t/batch=1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score")
      .write.parquet(s"$base/t/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$base/t")
    merged.columns.toSet shouldBe Set("id", "name", "score", "batch")
    val rows = merged.orderBy("id")
      .select($"id", $"score")
      .as[(Long, Option[Double])].collect()
    rows shouldBe Array((1L, None), (2L, Some(9.5)))
  }

  test("Io partitionBy write enables read-side partition pruning") {
    import spark.implicits._
    val df = Seq((1L, "x", "2024"), (2L, "y", "2025"), (3L, "z", "2025")).toDF("id", "v", "year")
    val base = tmpDir("part")
    Io.write(df, IoConfig("parquet", s"$base/t", partitionBy = Seq("year"), mode = "overwrite"))
    val pruned = Io.read(spark, IoConfig("parquet", s"$base/t")).filter(col("year") === "2025")
    pruned.count() shouldBe 2
    // only the matching hive partition's files are actually read
    val readFiles = pruned.select(input_file_name()).distinct().collect().map(_.getString(0))
    readFiles should not be empty
    readFiles.foreach(f => f should include("year=2025"))
  }

  test("Io.writeFanOut writes every sink from one computation") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "name")
    val base = tmpDir("fanout")
    Io.writeFanOut(df, Seq(
      IoConfig("parquet", s"$base/p", mode = "overwrite"),
      IoConfig("json", s"$base/j", mode = "overwrite")
    ))
    Io.read(spark, IoConfig("parquet", s"$base/p")).count() shouldBe 1
    Io.read(spark, IoConfig("json", s"$base/j")).count() shouldBe 1
  }

  test("binaryFile source ingests raw image files into typed media rows") {
    import graft.functions.Media
    import org.apache.spark.sql.functions._
    // the multimodal front door: raw files on disk -> binaryFile scan
    // (path, length, content) -> container-header parse — no driver
    // reads a single byte of image data
    val dir = java.nio.file.Files.createTempDirectory("graft-binsrc")
    java.nio.file.Files.write(dir.resolve("a.png"),
      Media.pngContainer(640, 480, Array[Byte](1, 2, 3)))
    java.nio.file.Files.write(dir.resolve("b.png"),
      Media.pngContainer(64, 48, Array[Byte]()))
    java.nio.file.Files.write(dir.resolve("junk.bin"), "not an image".getBytes)
    val parse = udf { (b: Array[Byte]) =>
      Media.parseHeader(b).map(h => (h.format, h.width, h.height))
    }
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png") // push the format filter to the SOURCE
      .load(dir.toString)
      .select(
        element_at(split(col("path"), "/"), -1).as("name"),
        col("length"),
        parse(col("content")).as("h")
      )
      .select(col("name"), col("length"), col("h._1").as("format"),
        col("h._2").as("w"), col("h._3").as("hgt"))
      .orderBy("name")
      .collect()
    rows.map(_.getString(0)).toSeq shouldBe Seq("a.png", "b.png") // junk.bin pruned at scan
    rows.map(r => (r.getString(2), r.getInt(3), r.getInt(4))).toSeq shouldBe
      Seq(("png", 640, 480), ("png", 64, 48))
  }

  test("input_file_name provenance column survives the scan") {
    import spark.implicits._
    val base = tmpDir("prov")
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$base/t")
    val withProv = spark.read.parquet(s"$base/t").withColumn("src", input_file_name())
    withProv.head.getAs[String]("src") should include(base)
  }

  // ------------------------------------------------------------------
  // Flat-file record source (distributed UniprotConverter redesign)
  // ------------------------------------------------------------------

  test("FlatFileSource parses line-coded records distributively") {
    val base = tmpDir("flat")
    val content =
      """ID   PROT1 Reviewed; 100 AA.
        |AC   P00001; P00002;
        |DE   RecName: Full=Test protein one;
        |//
        |ID   PROT2 Reviewed; 200 AA.
        |AC   P00003;
        |DE   RecName: Full=Test protein two;
        |DE   AltName: Full=Other name;
        |//
        |""".stripMargin
    Files.writeString(Paths.get(s"$base/sample.txt"), content)

    val records = FlatFileSource.readDelimitedRecords(spark, s"$base/sample.txt", "//\n")
    val parsed = FlatFileSource.parseLineCoded(records).collect().sortBy(_.id)
    parsed.map(_.id) shouldBe Array("PROT1", "PROT2")
    parsed(0).fields("AC") shouldBe Seq("P00001; P00002;")
    parsed(1).fields("DE") should have length 2
  }

  // ------------------------------------------------------------------
  // Porter stemmer (Spark-NLP Stemmer replacement)
  // ------------------------------------------------------------------

  test("Stemmer reduces classic Porter examples") {
    Stemmer.stem("caresses") shouldBe "caress"
    Stemmer.stem("ponies") shouldBe "poni"
    Stemmer.stem("ties") shouldBe "ti"
    Stemmer.stem("caress") shouldBe "caress"
    Stemmer.stem("cats") shouldBe "cat"
    Stemmer.stem("plastered") shouldBe "plaster"
    Stemmer.stem("motoring") shouldBe "motor"
    Stemmer.stem("conflated") shouldBe "conflat"
    Stemmer.stem("hopping") shouldBe "hop"
    Stemmer.stem("relational") shouldBe "relat"
    Stemmer.stem("rational") shouldBe "ration"
    Stemmer.stem("happy") shouldBe "happi"
    // step-4 applies at most ONE rule (the 'ion' strip must not re-run
    // on the already-stripped word): provisional -> provision, not provis
    Stemmer.stem("provisional") shouldBe "provision"
    Stemmer.stem("adoption") shouldBe "adopt"
    Stemmer.stem("replacement") shouldBe "replac"
  }

  test("Stemmer column form applies per token") {
    import spark.implicits._
    val out = Seq("running", "flies").toDF("w")
      .select(Stemmer.stemCol(col("w")).as("s"))
      .as[String].collect().sorted
    out shouldBe Array("fli", "run")
  }

  test("stemmed-grounding oracle vocabulary covers the documents corpus") {
    // The q_text_grounding_stemmed oracle embeds a (token -> stem) LUT
    // generated from OracleSql.stemmedGroundingVocab; if the corpus
    // ever contains a token outside that list the LUT is stale. Guard
    // it against the real testdata (same normalization chain).
    import spark.implicits._
    import graft.queries.OracleSql
    val stop = Seq("the", "a", "of", "and", "to", "in", "is")
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(translate(lower(col("text")),
        "áéíóúαβγδεζηικλμνξπτυω", "aeiouabgdezhiklmnxptuo"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "" && !col("tok").isin(stop: _*))
      .select("tok").distinct().as[String].collect().toSet
    toks.diff(OracleSql.stemmedGroundingVocab.toSet) shouldBe empty
  }

  // ------------------------------------------------------------------
  // Word2Vec (literature Embedding/Vectors phases)
  // ------------------------------------------------------------------

  test("EmbeddingModel trains, exposes a vector table, finds synonyms") {
    import spark.implicits._
    val corpus = Seq(
      Seq("spark", "fast", "engine"),
      Seq("spark", "fast", "query"),
      Seq("slow", "disk", "io"),
      Seq("slow", "disk", "spill")
    ).toDF("tokens")
    val model = EmbeddingModel.train(corpus, "tokens", vectorSize = 8, windowSize = 3)
    val vt = EmbeddingModel.vectorTable(model)
    vt.columns.toSeq shouldBe Seq("word", "vector", "norm")
    vt.count() shouldBe 8 // vocabulary size
    vt.head.getAs[Seq[Double]]("vector") should have length 8
    EmbeddingModel.synonyms(model, "spark", 3).count() shouldBe 3
  }
}
