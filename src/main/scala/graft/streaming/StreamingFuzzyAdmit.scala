package graft.streaming

import graft.ops.Fuzzy
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** Streaming typo-tolerant ADMISSION — the ingest-fleet form of the
  * deletion-banded edit-distance join ([[graft.ops.Fuzzy]]): each arriving
  * name/title is screened against a FROZEN corpus key table through a
  * stream-static equi-join on the deletion key, receiving an exactly-once
  * `corpus_dup` verdict (a distance-≤1 neighbor exists) — the
  * [[StreamingHammingAdmit]] shape with the bit-chunk key swapped for the
  * SymSpell deletion key. The registration-time "is this entity already
  * known under a misspelled name?" gate.
  *
  * Scale shape: a probe fans out to L+1 short-string key rows; the corpus
  * contributes NO streaming state (its key table is static — persist it
  * bucketed by key so per-batch joins need no corpus shuffle); the only
  * state is one boolean per in-flight doc (the shared TTL-bounded
  * [[StreamingNearDupAdmit.VerdictProcessor]]).
  */
object StreamingFuzzyAdmit {

  /** An incoming name to screen. */
  final case class Probe(docId: Long, s: String)

  /** JVM twin of [[Fuzzy.deletionKeys]] — the stream side computes probe
    * keys with this, so both must agree exactly (spec: verdict ≡ batch).
    */
  private[graft] def jvmDeletionKeys(s: String): Seq[String] =
    (s +: s.indices.map(i => s.substring(0, i) + s.substring(i + 1))).distinct

  /** The frozen corpus side: (__k, corpus_id, __sc) — one row per
    * (corpus string, deletion key), the [[Fuzzy.editNeighborPairs]] key
    * projection materialized once.
    */
  def frozenCorpusKeys(df: DataFrame, idCol: String, strCol: org.apache.spark.sql.Column): DataFrame =
    df.where(strCol.isNotNull)
      .select(col(idCol).as("corpus_id"), strCol.as("__sc"))
      .select(explode(Fuzzy.deletionKeys(col("__sc"))).as("__k"),
        col("corpus_id"), col("__sc"))

  /** The admission stream: per arriving probe, one (docId, corpus_dup,
    * admitted) row, exactly once, across any arrival batching.
    */
  def admissionStream(probes: Dataset[Probe], corpusKeys: DataFrame,
                      stateTtlMs: Long = 0L): DataFrame = {
    val spark = probes.sparkSession
    import spark.implicits._
    val keyed = probes.flatMap(p => jvmDeletionKeys(p.s).map(k => (k, p.docId, p.s)))
      .toDF("__k", "docId", "__sp")
    // LEFT join: a probe colliding on no key still needs its verdict row
    val hits = keyed.join(corpusKeys, Seq("__k"), "left_outer")
      .select(col("docId"),
        (col("__sc").isNotNull && levenshtein(col("__sp"), col("__sc")) <= 1).as("hit"))
    hits.as[(Long, Boolean)]
      .groupByKey(_._1)
      .transformWithState(new StreamingNearDupAdmit.VerdictProcessor(stateTtlMs),
        TimeMode.None(), OutputMode.Append())
      .toDF("docId", "corpus_dup", "admitted")
  }
}
