package graft.streaming

import graft.ops.SetJoin
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** Streaming EXACT set-similarity ADMISSION — the ingest-fleet form of
  * [[graft.ops.SetJoin.jaccardJoin]]: each arriving token set is screened
  * against a FROZEN corpus and receives an exactly-once `corpus_dup`
  * verdict (a corpus set with Jaccard ≥ t exists) — the
  * [[StreamingFuzzyAdmit]] shape with the deletion key swapped for the
  * set token, completing the admission family (exact / MinHash / Hamming
  * / fuzzy / set-similarity all share the stream-static candidate join +
  * [[StreamingNearDupAdmit.VerdictProcessor]] spine).
  *
  * Recall stands on the ONE-SIDED prefix lemma: the frozen side keeps
  * only each corpus set's rarest-first prefix ([[SetJoin.prefixTokens]],
  * |B| − ⌈t·|B|⌉ + 1 tokens under the corpus frequency order), while the
  * probe emits ALL its tokens — a qualifying pair shares ≥ ⌈t·|B|⌉
  * tokens, and B's suffix holds only ⌈t·|B|⌉ − 1 of them, so at least one
  * shared token hits B's prefix whatever the probe looks like (probe-side
  * prefixing would need the probe ranked under the corpus frequency
  * order — a per-batch window the stream doesn't need to pay).
  *
  * Scale shape: a probe fans out to |A| token rows (its array riding
  * along for the verify — KBs per probe, the admission regime's unit);
  * the corpus contributes NO streaming state — its prefix-token table and
  * its (id → set) table are static (persist both bucketed by their join
  * key so per-batch joins need no corpus shuffle); candidates meet the
  * corpus ONLY on prefix-token equality (a corpus-frequent stop-shingle
  * sorts last and stays out of every prefix, so batch fan-out is capped
  * exactly as in the batch operator); the verify is one exact
  * `array_intersect` per candidate row against the static set lookup,
  * integer threshold arithmetic identical to the batch gate; the only
  * streaming state is one boolean per in-flight doc (TTL-bounded).
  */
object StreamingSetJoinAdmit {

  /** An incoming token set to screen (tokens need not be pre-deduplicated;
    * the probe side dedups to match the batch operator's set semantics).
    */
  final case class Probe(docId: Long, tokens: Seq[String])

  /** The frozen corpus side, table 1 of 2: (__t, corpus_id, __nc) — one
    * row per (corpus set, PREFIX token), the [[SetJoin.prefixTokens]]
    * projection materialized once at freeze time. Empty sets are excluded
    * (J undefined), like the batch operator.
    */
  def frozenCorpusPrefix(df: DataFrame, idCol: String, tokens: Column,
                         tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold must be in (0,1]: $tNum/$tDen")
    val docs = df.select(col(idCol).as("__id"), tokens.as("__tk"))
      .where(size(col("__tk")) > 0)
    SetJoin.prefixTokens(SetJoin.withFreq(SetJoin.explodedTokens(docs)), tNum, tDen)
      .select(col("__t"), col("__id").as("corpus_id"), col("__n").as("__nc"))
  }

  /** The frozen corpus side, table 2 of 2: (corpus_id, __ctk) — the set
    * lookup the verify stage reads candidates' full token arrays from.
    */
  def frozenCorpusSets(df: DataFrame, idCol: String, tokens: Column): DataFrame =
    df.select(col(idCol).as("corpus_id"), tokens.as("__ctk"))
      .where(size(col("__ctk")) > 0)

  /** The admission stream: per arriving non-empty probe, one
    * (docId, corpus_dup, admitted) row, exactly once, across any arrival
    * batching. Empty probes have no defined Jaccard and emit no verdict.
    */
  def admissionStream(probes: Dataset[Probe], corpusPrefix: DataFrame,
                      corpusSets: DataFrame, tNum: Int, tDen: Int,
                      stateTtlMs: Long = 0L): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold must be in (0,1]: $tNum/$tDen")
    val spark = probes.sparkSession
    import spark.implicits._
    val keyed = probes.flatMap { p =>
      val tk = p.tokens.distinct
      tk.map(t => (t, p.docId, tk.size.toLong, tk))
    }.toDF("__t", "docId", "__np", "__tp")
    // LEFT joins: a probe colliding on no prefix token still needs its
    // verdict row (corpus_id stays null and the hit collapses to false)
    val hits = keyed.join(corpusPrefix, Seq("__t"), "left_outer")
      .join(corpusSets, Seq("corpus_id"), "left_outer")
      .withColumn("__i", size(array_intersect(col("__tp"), col("__ctk"))).cast("long"))
      .select(col("docId"),
        (col("corpus_id").isNotNull &&
          col("__i") * tDen >= (col("__np") + col("__nc") - col("__i")) * tNum)
          .as("hit"))
    hits.as[(Long, Boolean)]
      .groupByKey(_._1)
      .transformWithState(new StreamingNearDupAdmit.VerdictProcessor(stateTtlMs),
        TimeMode.None(), OutputMode.Append())
      .toDF("docId", "corpus_dup", "admitted")
  }
}
