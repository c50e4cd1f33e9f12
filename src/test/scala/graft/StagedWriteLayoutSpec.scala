package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.Streaming

/** Structural contract of the r20 staged-write sizing (guide §2.5/§6).
  *
  *  - The latest-wins upsert stages ONE data file per touched shard dir
  *    while paying only ONE exchange (the window's own, re-keyed to the
  *    shard — r19 bought the same layout with a second
  *    repartition(shardCol) exchange per commit, the
  *    storage_cdc_follow +38% its own A/B flagged).
  *  - The delete / table-save paths REBALANCE by the shard column: a
  *    deliberately skewed (whale) shard splits across >1 bounded
  *    staged file instead of serializing through one writer (the r19
  *    verdict's whale-shard straggler item), while small shards still
  *    collapse to one file each.
  */
class StagedWriteLayoutSpec extends AnyFunSuite with Matchers with SparkSessionSetup {
  import spark.implicits._

  /** LIVE data files per shard dir, resolved through the committed
    * manifest (physical listings would also count replaced files kept
    * until the retention horizon).
    */
  private def dataFilesPerShard(root: String): Map[String, Int] =
    Streaming.readCommitted(spark, root).inputFiles.toSeq
      .map(_.split('/').takeRight(2).head)
      .filter(_.startsWith("shard="))
      .groupBy(identity).map { case (d, fs) => d -> fs.size }

  test("upsert stages one data file per touched shard (single-exchange window fold)") {
    val target = Files.createTempDirectory("graft-layout-upsert").toString + "/t"
    // 16 shards x ~300 rows, deliberately spread over many input
    // partitions so the pre-r19 fan-out shape (input partitions x
    // shards) would be visible if it regressed
    val batch = spark.range(0, 4800)
      .select(col("id"), lit(1L).as("v"), (col("id") % 16).as("shard"))
      .repartition(8)
    Streaming.upsertPartitionedBatch(target, "id", "v", "shard")(batch, 1L)
    val files = dataFilesPerShard(target)
    files.size shouldBe 16
    all(files.values) shouldBe 1
    // and the merge semantics survived the (shard, key) window re-key:
    // a second batch with higher versions wins per key
    val batch2 = spark.range(0, 100)
      .select(col("id"), lit(2L).as("v"), (col("id") % 16).as("shard"))
    Streaming.upsertPartitionedBatch(target, "id", "v", "shard")(batch2, 2L)
    val read = Streaming.readCommitted(spark, target)
    read.count() shouldBe 4800
    read.filter(col("id") < 100 && col("v") === 2L).count() shouldBe 100
    all(dataFilesPerShard(target).values) should be >= 1
  }

  test("save/delete rebalance splits a whale shard across bounded staged files") {
    val target = Files.createTempDirectory("graft-layout-whale").toString + "/t"
    // shard 0 is a whale (200k rows of ~130-byte INCOMPRESSIBLE
    // payload — AQE sizes partitions by compressed shuffle bytes, so a
    // constant pad would defeat the skew probe); shards 1-3 are small
    val whale = spark.range(0, 200000)
      .select(col("id"), lit(1L).as("v"), lit(0L).as("shard"),
        repeat(sha2(col("id").cast("string"), 256), 2).as("pad"))
    val small = spark.range(200000, 200300)
      .select(col("id"), lit(1L).as("v"), (col("id") % 3 + 1).as("shard"),
        lit("y").as("pad"))
    // force the skew split at test scale: advisory sized far below the
    // whale's bytes (runtime conf, restored after). The split needs >1
    // map task feeding the rebalance exchange — guaranteed here by the
    // 16-way input; at scale a whale shard's pinned read spans many
    // files/splits, which is the same condition.
    val adv = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prev = spark.conf.getOption(adv)
    spark.conf.set(adv, "1m")
    try {
      whale.union(small).repartition(16)
        .write.format("graft").option("partitionBy", "shard").save(target)
      val saved = dataFilesPerShard(target)
      // whale dir written by >1 advisory-bounded task (the r19 advisor's
      // full-table-overwrite serialization item); small dirs stay 1 file
      saved("shard=0") should be > 1
      saved.filter(_._1 != "shard=0").values.foreach(_ shouldBe 1)
      // the delete path rebalances the same way: rewriting the touched
      // whale shard (now a multi-file pinned read => >1 mapper) keeps
      // the split layout rather than re-serializing it through one task
      val deleted = Streaming.deleteFromPartitioned(target, "id", "shard")(
        Seq((5L, 0L), (200001L, 1L)).toDF("id", "shard"))
      deleted shouldBe 2L
      val files = dataFilesPerShard(target)
      files("shard=0") should be > 1
      files.filter(_._1 != "shard=0").values.foreach(_ should be <= 2)
    } finally {
      prev.fold(spark.conf.unset(adv))(spark.conf.set(adv, _))
    }
    val read = Streaming.readCommitted(spark, target)
    read.count() shouldBe (200300L - 2)
    read.filter(col("id") === 5L).count() shouldBe 0
  }
}
