package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT set-similarity join — all pairs with Jaccard(A, B) ≥ t, no false
  * negatives, no sampling (the SSJoin family: Sarawagi & Kirpal SIGMOD'04,
  * Chaudhuri et al. ICDE'06). The deterministic complement to
  * [[Dedup.minhashNearDupPairs]]: MinHash trades a small recall loss for
  * signature-sized shuffles; this operator is the right tool when the
  * contract is EVERY pair (dedup audits, legal-discovery joins).
  *
  * Spark-first shape: |A∩B| is computed as a COUNT, never a set — the
  * exploded (id, token) table self-joins on the token and the matches
  * aggregate per id pair with full map-side combine, so the exchange
  * carries 16-byte id pairs and nothing array-shaped ever rides a sort
  * (the first formulation carried per-doc token ARRAYS through two
  * verification joins and died sorting ~10^8 KB-wide rows at corpus
  * scale — measured, see SCALING.md r9). Set sizes join back from a
  * genuinely broadcastable (id, size) table and the threshold check is
  * exact integer arithmetic (inter·tDen ≥ uni·tNum) — no doubles, so the
  * gate replays bit-for-bit in any engine.
  *
  * Scale posture: candidate volume is Σ_tokens C(occupancy, 2) — the
  * same premise as every banded join here: bounded-occupancy tokens
  * (shingles over a growing corpus) keep it linear. A corpus-frequent
  * token (a stop-shingle) is the cliff; the SHINGLE LENGTH is the knob
  * (longer shingles are rarer — raising n is this operator's
  * bitsPerBand), and the AllPairs rarest-first prefix filter is the
  * escalation if a workload genuinely needs frequency-unbounded tokens.
  */
object SetJoin {

  /** All (id_a, id_b, inter, uni) with id_a < id_b and
    * inter/uni ≥ tNum/tDen, where inter = |A∩B|, uni = |A∪B| — exact.
    * `tokens` must be a deduplicated array column (e.g.
    * [[Dedup.wordShingles]]); empty sets are excluded (J undefined).
    */
  def jaccardJoin(df: DataFrame, idCol: String, tokens: Column,
                  tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold must be in (0,1]: $tNum/$tDen")
    val docs = OpCaches.pin(
      df.select(col(idCol).as("__id"), tokens.as("__tk"))
        .where(size(col("__tk")) > 0))
    val toks = docs.select(col("__id"), explode(col("__tk")).as("__t"))
    val inter = toks.select(col("__t"), col("__id").as("id_a"))
      .join(toks.select(col("__t"), col("__id").as("id_b")).hint("merge"),
        Seq("__t"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    val sizes = docs.select(col("__id"), size(col("__tk")).cast("long").as("__n"))
    inter
      .join(broadcast(sizes.select(col("__id").as("id_a"), col("__n").as("__na"))),
        Seq("id_a"))
      .join(broadcast(sizes.select(col("__id").as("id_b"), col("__n").as("__nb"))),
        Seq("id_b"))
      .withColumn("uni", col("__na") + col("__nb") - col("inter"))
      .where(col("inter") * tDen >= col("uni") * tNum)
      .select("id_a", "id_b", "inter", "uni")
  }
}
