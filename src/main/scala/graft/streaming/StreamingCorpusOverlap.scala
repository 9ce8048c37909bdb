package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming corpus-overlap sketch — the running twin of
  * `ops/Dedup.corpusOverlapEstimate`'s signature half: the corpus-level
  * MinHash component is a MIN over all shingle hashes seen, and min is
  * APPEND-MONOTONE, so a stream maintains the EXACT batch signature as a
  * plain streaming global aggregate (complete mode). Total state =
  * `numPerm` longs — not per key, per QUERY — the most bounded state shape
  * in the streaming family (Bloom dedup holds bits per shard; this holds
  * 512 bytes, period).
  *
  * The reference signature (yesterday's frozen corpus) is `numPerm` longs
  * collected driver-side — routing-metadata class, like the ANN-serving
  * codebooks — and rides the plan as literals. Each micro-batch emits the
  * updated agreement estimate, so an ingest pipeline watches "how much of
  * the incoming crawl is old corpus" converge live and can cut over to
  * per-doc admission when the number crosses its threshold.
  *
  * The EXACT hash-set Jaccard half of the batch report deliberately does
  * not stream: it needs the distinct-shingle set — state linear in corpus
  * size. Sketch streams, census doesn't; the batch operator carries both
  * so the estimate's error stays auditable offline.
  */
object StreamingCorpusOverlap {

  /** Signature of a (batch) corpus as driver values: `numPerm` longs.
    * The model-fit collect pattern — run on the FROZEN reference corpus.
    */
  def referenceSignature(corpus: DataFrame, idCol: String, text: Column,
                         shingleLen: Int = 3, numPerm: Int = 64): Array[Long] = {
    val aggs = Dedup.corpusSigAggs(numPerm, "__s")
    val row = Dedup.corpusShingleHashes(corpus, idCol, text, shingleLen)
      .agg(aggs.head, aggs.tail: _*).head()
    (0 until numPerm).map(i => row.getLong(i)).toArray
  }

  /** The running overlap estimate of the streamed corpus against a frozen
    * reference signature. Works identically on a stream (complete mode —
    * the global min aggregate re-emits per micro-batch) or a batch frame.
    * Output: one row (n_perm, est_jaccard) that tightens as data arrives.
    */
  def overlapAgainst(docs: DataFrame, idCol: String, text: Column,
                     refSig: Array[Long], shingleLen: Int = 3): DataFrame = {
    require(refSig.nonEmpty, "reference signature must be non-empty")
    val numPerm = refSig.length
    val aggs = Dedup.corpusSigAggs(numPerm, "__s")
    val agree = (0 until numPerm).map(i =>
      when(col(s"__s$i") === lit(refSig(i)), 1).otherwise(0)).reduce(_ + _)
    Dedup.corpusShingleHashes(docs, idCol, text, shingleLen)
      .agg(aggs.head, aggs.tail: _*)
      .select(lit(numPerm).as("n_perm"),
        round(agree.cast("double") / lit(numPerm.toDouble), 6).as("est_jaccard"))
  }
}
