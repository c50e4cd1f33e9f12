package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.TextInputFormat

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** Distributed multi-line flat-record source.
  *
  * The reference parses UniprotKB flat files and GO OBO stanzas by
  * pulling the whole text file to the driver and chunking lines there
  * (target/Target.scala:453-458 `toLocalIterator`;
  * preprocess/uniprot/UniprotConverter.scala:51-90;
  * common/ConsumeWhileIterator.scala:27-41) — a driver-memory wall at
  * scale (SURVEY.md §7.4 names this as a must-fix).
  *
  * Re-design: set the Hadoop text-input record delimiter to the
  * flat-file record terminator, so each input split yields whole
  * records and parsing runs inside executors via mapPartitions. Fully
  * distributed, splittable, no driver round-trip.
  */
object FlatFileSource {

  /** One parsed record: line-code -> values, e.g. UniprotKB
    * `ID`/`AC`/`DE` codes (reference UniprotConverter.scala:15-49).
    */
  final case class FlatRecord(id: String, fields: Map[String, Seq[String]])

  /** Read a text file as one Dataset element per record, where records
    * are separated by `delimiter` (e.g. "//\n" for UniprotKB, "\n\n"
    * for OBO stanzas).
    */
  def readDelimitedRecords(
      spark: SparkSession,
      path: String,
      delimiter: String = "//\n"
  ): Dataset[String] = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", delimiter)
    val rdd = spark.sparkContext
      .newAPIHadoopFile(path, classOf[TextInputFormat], classOf[LongWritable], classOf[Text], conf)
      .map(_._2.toString)
    spark.createDataset(rdd)(Encoders.STRING)
  }

  /** Parse line-coded records ("CC   value" style, two-letter code +
    * whitespace + payload; continuation lines share the code). The id
    * is the first value of `idCode`. Runs per-partition on executors.
    */
  def parseLineCoded(
      records: Dataset[String],
      idCode: String = "ID"
  ): Dataset[FlatRecord] = {
    implicit val enc = Encoders.product[FlatRecord]
    records.mapPartitions { it =>
      it.flatMap { rec =>
        val fields = rec.linesIterator
          .filter(_.trim.nonEmpty)
          .flatMap { line =>
            val code = line.takeWhile(!_.isWhitespace)
            val value = line.drop(code.length).trim
            if (code.nonEmpty && value.nonEmpty) Some(code -> value) else None
          }
          .toSeq
          .groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2) }
        fields.get(idCode).flatMap(_.headOption).map { id =>
          FlatRecord(id.takeWhile(!_.isWhitespace), fields)
        }
      }
    }
  }
}
