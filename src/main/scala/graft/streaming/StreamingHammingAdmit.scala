package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** Streaming perceptual near-dup ADMISSION — the ingest-fleet form of the
  * banded Hamming join ([[graft.ops.Dedup.hamming64NearDupPairs]]) for ANY
  * 64-bit fingerprint modality: image dHash
  * ([[graft.ops.Multimodal.ppmDHash]]), audio energy hash
  * ([[graft.ops.Multimodal.wavEnergyHash]]), or text SimHash
  * ([[graft.ops.Dedup.simhash64]]). Incoming fingerprints stream against a
  * FROZEN corpus chunk table through a stream-static equi-join on the
  * (chunk, chunkVal) key, each doc receiving an exactly-once `corpus_dup`
  * verdict — the [[StreamingNearDupAdmit]] shape with the MinHash band key
  * swapped for the pigeonhole bit-chunk key.
  *
  * Scale shape: a probe fans out to `maxHamming + 1` rows of 24 bytes
  * (chunk index + value + the 8-byte hash for verification) — the heavy
  * media NEVER enters the stream; decode to the fingerprint upstream
  * (partition-local kernels) and ship 8 bytes per image/clip. Per-bucket
  * candidate work is bucket occupancy, which the
  * [[graft.ops.Dedup.hamming64NearDupPairs]] regime note bounds: use
  * maxHamming ≤ 3 (16-bit chunk keys) at corpus scale. The only streaming
  * STATE is one boolean per in-flight doc (the shared
  * [[StreamingNearDupAdmit.VerdictProcessor]], TTL-bounded) — the corpus
  * contributes none.
  */
object StreamingHammingAdmit {

  /** An incoming fingerprint (decode happens upstream — 8 bytes/doc). */
  final case class Fp(docId: Long, hash: Long)

  private def chunkBounds(maxHamming: Int): Seq[(Int, Long)] = {
    val n = maxHamming + 1
    (0 until n).map { ci =>
      val lo = ci * 64 / n
      val width = (ci + 1) * 64 / n - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1
      (lo, mask)
    }
  }

  /** JVM chunk twin of the Column math in [[frozenCorpusChunks]] — the
    * stream side computes keys with this, so both sides must agree
    * bit-for-bit (spec-checked via verdict ≡ batch).
    */
  private[graft] def chunkVal(hash: Long, lo: Int, mask: Long): Long =
    (hash >>> lo) & mask

  /** The frozen corpus side: (chunk, chunkVal, corpus_id, __hc) — one row
    * per (corpus doc, chunk), the [[graft.ops.Dedup.hamming64NearDupPairs]]
    * chunking materialized once. Persist or write it; ~(maxHamming + 1) ×
    * 24 bytes per corpus doc. At scale, pre-bucket the written table on
    * (chunk, chunkVal) so the per-batch join needs no corpus shuffle.
    */
  def frozenCorpusChunks(hashes: DataFrame, idCol: String, hashCol: String,
                         maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming ($maxHamming) out of range for a 64-bit hash")
    val chunkVals = array(chunkBounds(maxHamming).map { case (lo, mask) =>
      shiftrightunsigned(col(hashCol), lo).bitwiseAND(lit(mask))
    }: _*)
    hashes.select(col(idCol).as("corpus_id"), col(hashCol).as("__hc"),
        posexplode(chunkVals).as(Seq("chunk", "chunkVal")))
      .select("chunk", "chunkVal", "corpus_id", "__hc")
  }

  /** The admission stream: per arriving fingerprint, one (docId,
    * corpus_dup, admitted) row, exactly once, across any arrival batching.
    */
  def admissionStream(fps: Dataset[Fp], corpusChunked: DataFrame,
                      maxHamming: Int, stateTtlMs: Long = 0L): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming ($maxHamming) out of range for a 64-bit hash")
    val spark = fps.sparkSession
    import spark.implicits._
    val bounds = chunkBounds(maxHamming)
    val probes = fps.flatMap { f =>
      bounds.zipWithIndex.map { case ((lo, mask), ci) =>
        (ci, chunkVal(f.hash, lo, mask), f.docId, f.hash)
      }
    }.toDF("chunk", "chunkVal", "docId", "__hp")
    // stream-static LEFT join: a fingerprint colliding on no chunk anywhere
    // still needs its (admitted) verdict row
    val hits = probes.join(corpusChunked, Seq("chunk", "chunkVal"), "left_outer")
      .select(col("docId"),
        (col("__hc").isNotNull &&
          bit_count(col("__hp").bitwiseXOR(col("__hc"))) <= maxHamming).as("hit"))
    hits.as[(Long, Boolean)]
      .groupByKey(_._1)
      .transformWithState(new StreamingNearDupAdmit.VerdictProcessor(stateTtlMs),
        TimeMode.None(), OutputMode.Append())
      .toDF("docId", "corpus_dup", "admitted")
  }

  /** The FLAT-WAVE admission form: screen each micro-batch against a
    * [[graft.ops.HammingIndex]] written at `indexPath` instead of joining
    * the corpus table per batch. [[admissionStream]]'s stream-static join
    * re-scans the whole corpus every batch (SCALING.md: wave latency grew
    * ~×8 over a ×100 corpus); this form's per-batch cost is the probed
    * partition directories only (measured flat over the same range).
    * `sink(verdicts, batchId)` receives one (docId, corpus_dup, admitted)
    * row per batch doc — foreachBatch's batchId contract gives replay
    * idempotence to any sink keyed on it. The caller starts the returned
    * writer (checkpoint location, trigger) like any other stream.
    */
  def indexAdmissionWriter(fps: Dataset[Fp], indexPath: String, maxHamming: Int,
                           buckets: Int = 256)(
      sink: (org.apache.spark.sql.DataFrame, Long) => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[Fp] =
    fps.writeStream.foreachBatch { (batch: Dataset[Fp], batchId: Long) =>
      val verdicts = graft.ops.HammingIndex
        .screen(batch.sparkSession, indexPath, batch.toDF(), "docId", "hash",
          maxHamming, buckets)
        .withColumn("admitted", !col("corpus_dup"))
      sink(verdicts, batchId)
    }
}
