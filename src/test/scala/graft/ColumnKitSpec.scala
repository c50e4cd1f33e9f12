package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.ColumnKit

class ColumnKitSpec extends AnyFunSuite with Matchers with SparkSessionSetup {
  import spark.implicits._

  test("harmonicSum sorts desc and sums e_i/i^2") {
    val df = Seq(Seq(1.0, 4.0, 2.0)).toDF("xs")
    val got = df.select(ColumnKit.harmonicSum($"xs")).as[Double].head()
    got shouldBe (4.0 / 1 + 2.0 / 4 + 1.0 / 9) +- 1e-12
  }

  test("harmonicSum of empty array is 0") {
    val df = spark.sql("SELECT array() AS xs").select(ColumnKit.harmonicSum(col("xs").cast("array<double>")))
    df.as[Double].head() shouldBe 0.0
  }

  test("maxHarmonicSum(3) = 1 + 1/4 + 1/9") {
    val got = spark.range(1).select(ColumnKit.maxHarmonicSum(lit(3))).as[Double].head()
    got shouldBe (1.0 + 0.25 + 1.0 / 9) +- 1e-12
  }

  test("safeArrayUnion treats null as empty") {
    val df = Seq((Seq("a", "b"), null: Seq[String])).toDF("x", "y")
    val got = df.select(sort_array(ColumnKit.safeArrayUnion($"x", $"y"))).as[Seq[String]].head()
    got shouldBe Seq("a", "b")
  }

  test("flattenCat flattens, dedups and drops nulls") {
    val df = Seq((Seq("a", "b"), Seq("b", null))).toDF("x", "y")
    val got = df.select(sort_array(ColumnKit.flattenCat($"x", $"y"))).as[Seq[String]].head()
    got shouldBe Seq("a", "b")
  }

  test("decSum is exact and order-independent") {
    val df = (1 to 10000).map(i => i / 100.0).toDF("x").repartition(13)
    val got = df.select(ColumnKit.decSum($"x")).as[Double].head()
    got shouldBe 500050.0
  }

  test("priorityDedup keeps best priority per id, ordered by (priority, id)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // mirrors the reference's protein-id ordering test
    // (backend/target/TargetTest.scala:11-26): ensembl(1) beats
    // uniprot(2) beats obsolete(3) for the same id
    val df = Seq(Tuple1(Seq((2, "P1"), (1, "P1"), (3, "P1"), (2, "A9"), (1, "Z3")))).toDF("raw")
      .select(
        ColumnKit.priorityDedup(
          transform(col("raw"), x => struct(x.getField("_1").as("priority"), x.getField("_2").as("id")))
        ).as("ids")
      )
    df.as[Seq[String]].head shouldBe Seq("P1", "Z3", "A9")
  }

  test("priorityDedupIndexed matches priorityDedup on random inputs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(7)
    val rows = (1 to 50).map { _ =>
      Tuple1(Seq.fill(rng.nextInt(12))((1 + rng.nextInt(3), s"P${rng.nextInt(6)}")))
    }
    val pairs = transform(col("raw"),
      x => struct(x.getField("_1").as("priority"), x.getField("_2").as("id")))
    val df = rows.toDF("raw")
      .withColumn(
        "pairs_sorted",
        array_sort(transform(pairs,
          p => struct(p.getField("id").as("id"), p.getField("priority").as("priority"))))
      )
      .select(
        ColumnKit.priorityDedup(pairs).as("fold"),
        ColumnKit.priorityDedupIndexed(col("pairs_sorted")).as("indexed")
      )
    df.as[(Seq[String], Seq[String])].collect().foreach { case (fold, indexed) =>
      indexed shouldBe fold
    }
  }

  test("priority_dedup_ids native expression matches priorityDedup on random inputs") {
    import graft.plans.GraftExtensions
    val rng = new scala.util.Random(13)
    val rows = (1 to 80).map { _ =>
      Tuple1(Seq.fill(rng.nextInt(15))((1 + rng.nextInt(4), s"P${rng.nextInt(8)}")))
    }
    val pairs = transform(col("raw"),
      x => struct(x.getField("_1").as("priority"), x.getField("_2").as("id")))
    val df = rows.toDF("raw")
      .select(
        ColumnKit.priorityDedup(pairs).as("fold"),
        GraftExtensions.priorityDedupIds(pairs).as("native")
      )
    df.as[(Seq[String], Seq[String])].collect().foreach { case (fold, native) =>
      native shouldBe fold
    }
  }

  test("priority_dedup_ids handles null array, null ids and null priorities") {
    import graft.plans.GraftExtensions
    // null array -> null; null id entries dropped; null priority loses
    // to any real priority (UDF drop/last semantics)
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(named_struct('priority', 2, 'id', 'a'),
        |         named_struct('priority', CAST(NULL AS INT), 'id', 'b'),
        |         named_struct('priority', 1, 'id', CAST(NULL AS STRING)),
        |         named_struct('priority', 1, 'id', 'b'))),
        |  (CAST(NULL AS ARRAY<STRUCT<priority: INT, id: STRING>>))
        |AS t(raw)""".stripMargin)
      .select(GraftExtensions.priorityDedupIds(col("raw")).as("ids"))
    df.as[Option[Seq[String]]].collect().toSet shouldBe Set(Some(Seq("b", "a")), None)
  }

  test("priority_dedup_ids is SQL-registrable via GraftExtensions") {
    graft.plans.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT priority_dedup_ids(array(named_struct('priority', 2, 'id', 'x')," +
        " named_struct('priority', 1, 'id', 'x'))) AS ids")
      .as[Seq[String]].head()
    got shouldBe Seq("x")
  }

  test("nest collapses columns into a struct") {
    val df = Seq((1, "a", 2.0)).toDF("id", "s", "v")
    val nested = ColumnKit.nest(df, Seq("s", "v"), "payload")
    nested.columns.toSet shouldBe Set("id", "payload")
    nested.select($"payload.s").as[String].head() shouldBe "a"
  }

  test("unionDifferentSchema pads missing columns with nulls") {
    val a = Seq((1, "x")).toDF("id", "a_only")
    val b = Seq((2, 3.5)).toDF("id", "b_only")
    val u = ColumnKit.unionDifferentSchema(a, b).orderBy("id")
    u.columns.toSet shouldBe Set("id", "a_only", "b_only")
    u.count() shouldBe 2
    u.filter($"id" === 2).select($"a_only").head().isNullAt(0) shouldBe true
  }

  test("melt unpivots wide to long") {
    val df = Seq(("n1", 1L, 2L)).toDF("name", "m1", "m2")
    val long = ColumnKit.melt(df, Seq("name"), Seq("m1", "m2"), "metric", "v").orderBy("metric")
    long.count() shouldBe 2
    long.select($"metric").as[String].collect() shouldBe Array("m1", "m2")
  }

  test("renameAllColumns renames nested struct fields") {
    val df = spark.sql("SELECT named_struct('inner_field', 1) AS outer_col")
    val renamed = ColumnKit.renameAllColumns(df, ColumnKit.snakeToLowerCamel)
    renamed.columns.head shouldBe "outerCol"
    renamed.select($"outerCol.innerField").as[Int].head() shouldBe 1
  }

  test("stripIdFromUri keeps the URI tail") {
    val df = Seq("http://purl.obolibrary.org/obo/GO_0005515").toDF("uri")
    df.select(ColumnKit.stripIdFromUri($"uri")).as[String].head() shouldBe "GO_0005515"
  }

  test("validateDF throws on missing columns") {
    val df = Seq((1, 2)).toDF("a", "b")
    ColumnKit.validateDF(Set("a"), df)
    an[IllegalArgumentException] should be thrownBy ColumnKit.validateDF(Set("zz"), df)
  }
}
