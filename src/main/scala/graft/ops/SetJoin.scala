package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity join — all pairs with Jaccard(A, B) ≥ t, no false
  * negatives, no sampling (the SSJoin family: Sarawagi & Kirpal SIGMOD'04,
  * Chaudhuri et al. ICDE'06). The deterministic complement to
  * [[Dedup.minhashNearDupPairs]]: MinHash trades a small recall loss for
  * signature-sized shuffles; this operator is the right tool when the
  * contract is EVERY pair (dedup audits, legal-discovery joins).
  *
  * Spark-first shape, two stages (the AllPairs/PPJoin decomposition,
  * Bayardo et al. WWW'07, Xiao et al. WWW'08, parallelized à la Vernica
  * et al. SIGMOD'10):
  *
  *  1. CANDIDATES by rarest-first prefix filter. Tokens get a global
  *     canonical order (corpus frequency ascending, token value as
  *     tiebreak); each set emits only its first |A| − ⌈t·|A|⌉ + 1 tokens
  *     in that order as join keys. The prefix lemma guarantees recall 1:
  *     J(A,B) ≥ t ⇒ |A∩B| ≥ ⌈t·max(|A|,|B|)⌉, and two sets whose
  *     prefixes at those lengths are disjoint can share at most
  *     ⌈t·|A|⌉ − 1 tokens. Candidate volume is Σ_tokens C(prefix-occ, 2)
  *     — and a corpus-FREQUENT token (a stop-shingle) sorts LAST, so it
  *     almost never lands in a prefix: the quadratic cliff of the naive
  *     Σ C(occ, 2) token self-join is capped by construction rather than
  *     by a bounded-occupancy premise (measured: a shingle planted in 30%
  *     of docs is quadratic-infeasible unfiltered and ~linear filtered,
  *     SCALING.md r10).
  *  2. VERIFY by counts, never arrays: candidate pairs re-join the
  *     exploded (id, token) table on each side and shared tokens
  *     aggregate per pair with full map-side combine — the exchange
  *     carries ids and single tokens, nothing array-shaped ever rides a
  *     sort (the formulation that carried per-doc token ARRAYS through
  *     verification died sorting ~10^8 KB-wide rows at corpus scale —
  *     measured, SCALING.md r9). Set sizes ride the prefix rows into the
  *     aggregate keys — no size-table join at all (the broadcast-hinted
  *     corpus-cardinality sizes join of the r9 form was itself a driver
  *     OOM at the 100 TB posture). The threshold check is exact integer
  *     arithmetic (inter·tDen ≥ uni·tNum) — no doubles, so the gate
  *     replays bit-for-bit in any engine.
  *
  * Every join here sits downstream of an explode, so strategies are
  * pinned sort-merge (Catalyst size estimates undercount generate
  * fan-out and auto-broadcast multi-GB sides — measured, SCALING.md r9).
  */
object SetJoin {

  /** All (id_a, id_b, inter, uni) with id_a < id_b and
    * inter/uni ≥ tNum/tDen, where inter = |A∩B|, uni = |A∪B| — exact.
    * `tokens` must be a deduplicated array column (e.g.
    * [[Dedup.wordShingles]]); empty sets are excluded (J undefined).
    */
  /** (__id, __n, __t) — one row per (doc, token) with the doc's set size
    * attached, over docs shaped (__id, __tk).
    */
  private[graft] def explodedTokens(docs: DataFrame): DataFrame =
    docs.select(col("__id"), size(col("__tk")).cast("long").as("__n"),
      explode(col("__tk")).as("__t"))

  /** The rarest-first prefix of every set: keep each doc's first
    * |A| − ⌈t·|A|⌉ + 1 tokens under the canonical order (corpus frequency
    * asc, token asc — total: tokens are unique within a doc, identical for
    * every doc). Exact integers: ⌈tNum·n / tDen⌉ = (tNum·n + tDen−1) div
    * tDen. Shared by [[jaccardJoin]] (both sides) and
    * [[graft.streaming.StreamingSetJoinAdmit]] (frozen corpus side).
    */
  private[graft] def prefixTokens(toks: DataFrame, tNum: Int, tDen: Int): DataFrame =
    toks.join(toks.groupBy("__t").agg(count(lit(1)).as("__f")).hint("merge"),
        Seq("__t"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__id").orderBy(col("__f"), col("__t"))))
      .where(expr(s"__rn <= __n - (($tNum * __n + ${tDen - 1}) div $tDen) + 1"))
      .select(col("__t"), col("__id"), col("__n"))

  def jaccardJoin(df: DataFrame, idCol: String, tokens: Column,
                  tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold must be in (0,1]: $tNum/$tDen")
    val docs = df.select(col(idCol).as("__id"), tokens.as("__tk"))
      .where(size(col("__tk")) > 0)
    val toks = OpCaches.pin(explodedTokens(docs))
    val prefix = prefixTokens(toks, tNum, tDen)
    // A pair sharing k prefix tokens surfaces k times; distinct() is a
    // map-side-combinable shuffle of 16-byte pairs (+ their sizes, which
    // are functions of the ids and ride along into the verify keys).
    val cand = prefix.select(col("__t"), col("__id").as("id_a"), col("__n").as("__na"))
      .join(prefix.select(col("__t"), col("__id").as("id_b"), col("__n").as("__nb"))
        .hint("merge"), Seq("__t"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "__na", "__nb").distinct()
    cand
      .join(toks.select(col("__id").as("id_a"), col("__t")).hint("merge"), Seq("id_a"))
      .join(toks.select(col("__id").as("id_b"), col("__t")).hint("merge"),
        Seq("id_b", "__t"))
      .groupBy("id_a", "id_b", "__na", "__nb").agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("__na") + col("__nb") - col("inter"))
      .where(col("inter") * tDen >= col("uni") * tNum)
      .select("id_a", "id_b", "inter", "uni")
  }
}
