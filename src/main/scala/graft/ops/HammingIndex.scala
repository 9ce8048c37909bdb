package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Disk-layout index for fingerprint screening at ingest time — the
  * 100 TB form of the [[Dedup.hamming64NearDupPairs]] chunk join when the
  * corpus side is frozen and lookups arrive in small batches (the
  * `StreamingHammingAdmit` / daily-shard workflow).
  *
  * The stream-static join re-scans the whole corpus chunk table every
  * micro-batch (measured in SCALING.md: per-wave latency tracks corpus
  * size). This index removes that scan: the chunk table is WRITTEN ONCE
  * partitioned by a bounded hash-bucket of its (chunk, chunkVal) key, and
  * a probe batch reads only the directories its own keys touch — at most
  * `batch × (maxHamming + 1)` of the `buckets` partitions, independent of
  * corpus size. The bucket column is derived with a portable modulus (not
  * an engine-internal hash), so any writer/reader pair agrees on the
  * layout.
  */
object HammingIndex {

  private def pbucket(buckets: Int) =
    pmod(col("chunkVal") * 31L + col("chunk"), lit(buckets.toLong)).cast("int")

  /** Freeze `hashes` (id, 64-bit hash) as a partitioned chunk index at
    * `path`. One-time linear job; ~(maxHamming + 1) × 24 bytes per doc.
    */
  def write(hashes: DataFrame, idCol: String, hashCol: String,
            maxHamming: Int, path: String, buckets: Int = 256): Unit = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    graft.streaming.StreamingHammingAdmit
      .frozenCorpusChunks(hashes, idCol, hashCol, maxHamming)
      .withColumn("pbucket", pbucket(buckets))
      .write.mode("overwrite").partitionBy("pbucket").parquet(path)
  }

  /** Screen a probe batch against the written index. The batch's chunk
    * keys are collected driver-side (bounded: ≤ batch × (maxHamming + 1)
    * longs — the BATCH is small by contract, the corpus never is) and
    * pushed as a partition filter, so the scan touches only the probed
    * directories. Returns (idCol, corpus_dup) — one row per probe id.
    */
  def screen(spark: SparkSession, path: String, probes: DataFrame,
             idCol: String, hashCol: String, maxHamming: Int,
             buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val probeChunks = graft.streaming.StreamingHammingAdmit
      .frozenCorpusChunks(probes, idCol, hashCol, maxHamming)
      .withColumnRenamed("corpus_id", "__pid")
      .withColumnRenamed("__hc", "__hp")
      .withColumn("pbucket", pbucket(buckets))
    val touched = probeChunks.select("pbucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) // empty probe batch: no verdict rows, no scan
      return probes.select(col(idCol)).limit(0).withColumn("corpus_dup", lit(false))
    val corpus = spark.read.parquet(path)
      .where(col("pbucket").isin(touched: _*)) // partition-pruned scan
    probeChunks.join(corpus, Seq("pbucket", "chunk", "chunkVal"), "left_outer")
      .groupBy(col("__pid").as(idCol))
      .agg(max(col("__hc").isNotNull &&
        bit_count(col("__hp").bitwiseXOR(col("__hc"))) <= maxHamming).as("corpus_dup"))
  }
}
