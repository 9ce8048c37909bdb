package graft.ops

import org.apache.spark.sql.SparkSession

/** Persistence for the engine's learned MODEL ARTIFACTS — the small
  * driver-side products of in-engine training (logreg weights, k-means
  * centroids, PQ codebooks, BPE merge lists) that a deployment fits ONCE
  * on the corpus and then ships to every scoring fleet. Training costs
  * corpus passes; scoring must not — so the artifact round-trips through
  * parquet with bit-exact doubles (parquet stores IEEE754 verbatim; no
  * text formatting is involved), and a reloaded model scores identically
  * to the fresh one. Artifacts are tiny by the engine's own contracts
  * (d weights, k×dim centroids, m×2^bits×subDim codebooks): one parquet
  * footer each, driver-trivial to read.
  *
  * Layout: one row per scalar — (i, j, k, v) index coordinates with
  * unused dimensions zero — a single schema for vectors, matrices, and
  * 3-tensors, ordered deterministically on read.
  */
object ModelStore {

  /** Save a weight vector (e.g. [[Classify.logregFitOnDomainTrust]]'s
    * output): rows (i, 0, 0, v).
    */
  def saveVector(spark: SparkSession, w: Array[Double], path: String): Unit = {
    import spark.implicits._
    w.zipWithIndex.toSeq.map { case (v, i) => (i, 0, 0, v) }
      .toDF("i", "j", "k", "v")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadVector(spark: SparkSession, path: String): Array[Double] = {
    import spark.implicits._
    spark.read.parquet(path).select("i", "v").as[(Int, Double)]
      .collect().sortBy(_._1).map(_._2)
  }

  /** Save a matrix (e.g. k-means centroids, k × dim): rows (i, j, 0, v). */
  def saveMatrix(spark: SparkSession, m: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    (for { i <- m.indices; j <- m(i).indices } yield (i, j, 0, m(i)(j)))
      .toDF("i", "j", "k", "v")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadMatrix(spark: SparkSession, path: String): Array[Array[Double]] = {
    import spark.implicits._
    spark.read.parquet(path).select("i", "j", "v").as[(Int, Int, Double)]
      .collect().groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3))
  }

  /** Save an ORDERED string-pair list (the BPE merge table: rank-ordered
    * (lhs, rhs) merges — [[Bpe.learnMerges]] output): rows (i, lhs, rhs)
    * with i the merge rank, so reload restores the exact application
    * order the tokenizer's semantics depend on.
    */
  def savePairs(spark: SparkSession, pairs: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    pairs.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
      .toDF("i", "lhs", "rhs")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadPairs(spark: SparkSession, path: String): Seq[(String, String)] = {
    import spark.implicits._
    spark.read.parquet(path).select("i", "lhs", "rhs").as[(Int, String, String)]
      .collect().sortBy(_._1).map(t => (t._2, t._3)).toSeq
  }

  /** Save a 3-tensor (e.g. PQ codebooks, m × 2^bits × subDim):
    * rows (i, j, k, v).
    */
  def saveTensor3(spark: SparkSession, t: Array[Array[Array[Double]]], path: String): Unit = {
    import spark.implicits._
    (for { i <- t.indices; j <- t(i).indices; k <- t(i)(j).indices }
      yield (i, j, k, t(i)(j)(k)))
      .toDF("i", "j", "k", "v")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadTensor3(spark: SparkSession, path: String): Array[Array[Array[Double]]] = {
    import spark.implicits._
    spark.read.parquet(path).select("i", "j", "k", "v").as[(Int, Int, Int, Double)]
      .collect().groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.groupBy(_._2).toArray.sortBy(_._1)
        .map(_._2.sortBy(_._3).map(_._4)))
  }
}
