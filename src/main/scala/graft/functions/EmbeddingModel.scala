package graft.functions

import org.apache.spark.ml.feature.{Word2Vec, Word2VecModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Word2Vec training + vector-table extraction, mirroring the
  * reference's literature embedding phase
  * (literature/Embedding.scala:79-90 trains on grouped keyword
  * "sentences"; literature/Vectors.scala:29-56 turns the model into a
  * (word, vector, norm) table). MLlib-native; the training knobs
  * default to the reference's configuration (reference.conf:771-777).
  */
object EmbeddingModel {

  /** Train on a column of token arrays. Seeded -> reproducible given
    * the same partitioning.
    */
  def train(
      sentences: DataFrame,
      tokensCol: String,
      vectorSize: Int = 32,
      windowSize: Int = 10,
      maxIter: Int = 3,
      minCount: Int = 1,
      stepSize: Double = 0.02,
      numPartitions: Int = 1,
      seed: Long = 42L
  ): Word2VecModel =
    new Word2Vec()
      .setInputCol(tokensCol)
      .setOutputCol("w2v")
      .setVectorSize(vectorSize)
      .setWindowSize(windowSize)
      .setMaxIter(maxIter)
      .setMinCount(minCount)
      .setStepSize(stepSize)
      .setNumPartitions(numPartitions)
      .setSeed(seed)
      .fit(sentences)

  /** Model -> (word, vector Array[Double], norm) table — the
    * Vectors-step output shape, with the L2 norm computed by
    * VectorKit instead of a UDF over MLlib vectors.
    */
  def vectorTable(model: Word2VecModel): DataFrame =
    model.getVectors
      .select(
        col("word"),
        org.apache.spark.ml.functions.vector_to_array(col("vector")).as("vector")
      )
      .withColumn("norm", VectorKit.norm(col("vector")))

  /** Cosine top-k synonyms for a word, via the model's built-in BLAS
    * path.
    */
  def synonyms(model: Word2VecModel, word: String, k: Int): DataFrame =
    model.findSynonyms(word, k)
}
