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
  * Spark-first shape — |A∩B| is computed as a COUNT, never a set: the
  * exchange carries ids and single tokens, nothing array-shaped ever
  * rides a sort (the formulation that carried per-doc token ARRAYS
  * through verification died sorting ~10^8 KB-wide rows at corpus scale —
  * measured, SCALING.md r9). The threshold check is exact integer
  * arithmetic (inter·tDen ≥ uni·tNum) — no doubles, so the gate replays
  * bit-for-bit in any engine. Set sizes ride the exploded rows into
  * aggregate keys — no size-table join (the broadcast-hinted
  * corpus-cardinality sizes join of the r9 form was itself a driver OOM
  * at the 100 TB posture).
  *
  * The skew story (r10, the PPJoin lesson re-derived by measurement —
  * Xiao et al. WWW'08, Bayardo et al. WWW'07, Vernica et al. SIGMOD'10):
  * the natural Σ_t C(occ, 2) token self-join counts each (pair, shared
  * token) once — the MINIMAL verify work — but goes quadratic on one
  * corpus-frequent stop-shingle. The textbook answer, prefix-filtered
  * candidates verified per pair, removes that cliff but pays
  * Σ_cand(|A| + |B|) in verification — measured 150 GB of shuffle at
  * ×100 on the registered corpus where the count form pays 127M rows
  * (most candidates share ONE token; charging |A| per candidate instead
  * of inter per candidate is the regression). So the shipped form SPLITS
  * tokens by corpus occupancy at `heavyOcc`:
  *
  *  - LIGHT tokens (occ ≤ heavyOcc): the count-based self-join, volume
  *    capped at occ·rows/2 per type by construction — linear whatever
  *    the distribution does above the cap.
  *  - HEAVY tokens: never self-joined. Pairs sharing ONLY heavy tokens
  *    are caught by a rarest-first PREFIX join (prefix lemma: a
  *    qualifying pair shares a token in both prefixes, and an all-shared-
  *    tokens-heavy pair has heavy tokens in its prefixes) restricted to
  *    docs that CARRY a heavy token; then every spine pair's shared-heavy
  *    count comes from two joins against the per-doc heavy token rows
  *    (few per doc — a doc's heavy tokens are its stop-shingles).
  *    inter = shared-light + shared-heavy, exactly.
  *
  * When NO token exceeds `heavyOcc` — every bounded-occupancy corpus —
  * the heavy branch short-circuits (one cheap existence probe on the
  * frequency aggregate) and the plan IS the minimal count form plus that
  * probe. The quadratic cliff only survives where the OUTPUT itself is
  * quadratic (a corpus that is 30% copies of one stop-shingle set owes
  * quadratically many result pairs — no algorithm beats its output size).
  * Measured: a shingle planted in 30% of docs is quadratic-infeasible for
  * the unsplit form and ~linear here (SCALING.md r10).
  *
  * Every join sits downstream of an explode, so strategies are pinned
  * sort-merge (Catalyst size estimates undercount generate fan-out and
  * auto-broadcast multi-GB sides; at local[32] shuffle-hash build maps
  * die where sort-merge spills — measured, SCALING.md r9).
  */
object SetJoin {

  /** Occupancy split point: tokens in more sets than this are "heavy" and
    * excluded from the count self-join. Worst-case light candidate volume
    * is heavyOcc·|token rows|/2; real corpora sit far below (occupancy
    * ~40 on the registered shingle corpus at every scale).
    */
  val DefaultHeavyOcc = 1024

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
    * tDen. `toks` must already carry the corpus frequency column `__f`
    * ([[withFreq]]). Shared by [[jaccardJoin]] (heavy-doc candidates) and
    * [[graft.streaming.StreamingSetJoinAdmit]] (frozen corpus side).
    */
  private[graft] def prefixTokens(toksF: DataFrame, tNum: Int, tDen: Int): DataFrame =
    toksF
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__id").orderBy(col("__f"), col("__t"))))
      .where(expr(s"__rn <= __n - (($tNum * __n + ${tDen - 1}) div $tDen) + 1"))
      .select(col("__t"), col("__id"), col("__n"))

  /** Exploded token rows with the corpus frequency of each token joined
    * on (pinned sort-merge: both sides descend from the explode).
    */
  private[graft] def withFreq(toks: DataFrame): DataFrame =
    toks.join(toks.groupBy("__t").agg(count(lit(1)).as("__f")).hint("merge"),
      Seq("__t"))

  /** All (id_a, id_b, inter, uni) with id_a < id_b and
    * inter/uni ≥ tNum/tDen, where inter = |A∩B|, uni = |A∪B| — exact.
    * `tokens` must be a deduplicated array column (e.g.
    * [[Dedup.wordShingles]]); empty sets are excluded (J undefined).
    *
    * `heavyProbe`: when true (default), one bounded driver action — a
    * `take(1)` on the already-pinned frequency aggregate — short-circuits
    * the heavy branch on corpora with no over-occupancy token, keeping
    * the plan the minimal count form. Pass false when COMPOSING this
    * operator inside a larger lazy plan: the heavy branch is then built
    * unconditionally (its joins degenerate to empty at runtime on
    * unskewed corpora — same results, fully lazy, a slightly larger
    * plan).
    */
  def jaccardJoin(df: DataFrame, idCol: String, tokens: Column,
                  tNum: Int, tDen: Int,
                  heavyOcc: Int = DefaultHeavyOcc,
                  heavyProbe: Boolean = true): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold must be in (0,1]: $tNum/$tDen")
    require(heavyOcc >= 1, s"heavyOcc must be >= 1: $heavyOcc")
    val docs = df.select(col(idCol).as("__id"), tokens.as("__tk"))
      .where(size(col("__tk")) > 0)
    val toksF = OpCaches.pin(withFreq(explodedTokens(docs)))
    val light = toksF.where(col("__f") <= heavyOcc)
    val heavy = toksF.where(col("__f") > heavyOcc)
    // shared-light counts: one row per (pair, shared light token) into a
    // map-side-combined aggregate; sizes ride the rows into the keys
    val lightCounts = light.select(col("__t"), col("__id").as("id_a"), col("__n").as("__na"))
      .join(light.select(col("__t"), col("__id").as("id_b"), col("__n").as("__nb"))
        .hint("merge"), Seq("__t"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "__na", "__nb").agg(count(lit(1)).as("__l"))
    // the existence probe is one driver boolean off the already-computed
    // frequency aggregate — the price of skew-proofing on an unskewed
    // corpus (the take(1) runs the pinned toksF build the verify reuses)
    val heavyEmpty = heavyProbe && heavy.take(1).isEmpty
    val spine =
      if (heavyEmpty) lightCounts
      else {
        // docs that CARRY a heavy token: the only ones whose pairs can
        // share exclusively-heavy tokens (everything else is in
        // lightCounts already); their prefixes are ranked over the FULL
        // token set, so the prefix lemma applies verbatim
        val heavyDocs = heavy.select("__id").distinct()
        val prefix = prefixTokens(toksF.join(heavyDocs.hint("merge"), Seq("__id")),
          tNum, tDen)
        val cand = prefix.select(col("__t"), col("__id").as("id_a"), col("__n").as("__na"))
          .join(prefix.select(col("__t"), col("__id").as("id_b"), col("__n").as("__nb"))
            .hint("merge"), Seq("__t"))
          .where(col("id_a") < col("id_b"))
          .select("id_a", "id_b", "__na", "__nb").distinct()
          .withColumn("__l", lit(0L))
        // spine = light pairs ∪ heavy-doc candidates; max(l) keeps the
        // light count where a pair appears in both
        lightCounts.unionByName(cand)
          .groupBy("id_a", "id_b", "__na", "__nb").agg(max(col("__l")).as("__l"))
      }
    val withHeavy =
      if (heavyEmpty) spine.withColumn("inter", col("__l"))
      else {
        // shared-heavy counts per spine pair: two joins against the
        // per-doc heavy rows (few per doc); pairs sharing no heavy token
        // drop from the inner joins and coalesce to 0
        val h = spine.select("id_a", "id_b")
          .join(heavy.select(col("__id").as("id_a"), col("__t")).hint("merge"),
            Seq("id_a"))
          .join(heavy.select(col("__id").as("id_b"), col("__t")).hint("merge"),
            Seq("id_b", "__t"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("__h"))
        spine.join(h.hint("merge"), Seq("id_a", "id_b"), "left_outer")
          .withColumn("inter", col("__l") + coalesce(col("__h"), lit(0L)))
      }
    withHeavy
      .withColumn("uni", col("__na") + col("__nb") - col("inter"))
      .where(col("inter") * tDen >= col("uni") * tNum)
      .select("id_a", "id_b", "inter", "uni")
  }

  /** Integer micro-idf weight of a token: round(10^6 · ln((D+1)/(df+1)))
    * — exact-integer thereafter, so the threshold check replays
    * bit-for-bit in any engine (the x5_lm_score fixed-point discipline;
    * ln agrees to 1 ulp across engines, and the single round at the
    * model boundary absorbs it). `__f` is corpus doc-frequency (tokens
    * are per-doc deduplicated), `__D` the corpus doc count. Weights are
    * ≥ 0 (df ≤ D); a token in EVERY doc weighs 0 — non-discriminative
    * tokens contribute nothing to either side of the ratio, which is
    * the point of weighting.
    */
  private def microIdf: Column =
    round(log((col("__D") + lit(1.0)) / (col("__f") + lit(1.0))) * lit(1e6))
      .cast("long")

  /** The weighted prefix of every set: under the same canonical order
    * (corpus frequency asc, token asc), keep each token whose PRECEDING
    * cumulative weight still allows a qualifying pair to hide entirely
    * in the suffix — cumBefore·tDen ≤ wn·(tDen−tNum). The unweighted
    * prefix is exactly this with w ≡ 1 (cumBefore = rank − 1). Lemma: a
    * pair with WJ ≥ t has interW ≥ t·uniW ≥ t·max(wA, wB); if A and B
    * shared no prefix token, every shared token would sit in both
    * suffixes, whose weight is < t·wA by construction — contradiction.
    */
  private[graft] def weightedPrefixTokens(toksW: DataFrame, tNum: Int,
                                          tDen: Int): DataFrame =
    toksW
      .withColumn("__cumb", coalesce(sum(col("__w")).over(
        Window.partitionBy("__id").orderBy(col("__f"), col("__t"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .where(col("__cumb") * tDen <= col("__wn") * (tDen - tNum))
      .select(col("__t"), col("__id"), col("__wn"))

  /** WEIGHTED exact set-similarity join — all pairs with
    * `WJ(A, B) = Σ_{t∈A∩B} w(t) / Σ_{t∈A∪B} w(t) ≥ tNum/tDen` under
    * integer micro-idf token weights ([[microIdf]]) derived from the
    * SAME corpus-occupancy aggregate the unweighted form already
    * computes — the form boilerplate-heavy dedup corpora actually want
    * (SSJoin with tf-idf weighting, Chaudhuri et al. ICDE'06 §5;
    * a stop-shingle shared by half the corpus stops deciding
    * near-duplication, a rare shared passage decides it strongly).
    *
    * Same scale shape as [[jaccardJoin]] — intersections are map-side-
    * combinable WEIGHT SUMS (never sets), sizes ride aggregate keys,
    * every join downstream of the explode pins sort-merge, and the
    * light/heavy occupancy split caps the self-join volume with heavy
    * pairs recovered through the weighted prefix lemma
    * ([[weightedPrefixTokens]]). Output:
    * (id_a, id_b, inter_w, uni_w) in micro-idf units; pairs with
    * uni_w = 0 (all-ubiquitous-token docs) are excluded — WJ undefined,
    * the empty-set convention one level up.
    */
  def weightedJaccardJoin(df: DataFrame, idCol: String, tokens: Column,
                          tNum: Int, tDen: Int,
                          heavyOcc: Int = DefaultHeavyOcc,
                          heavyProbe: Boolean = true): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold must be in (0,1]: $tNum/$tDen")
    require(heavyOcc >= 1, s"heavyOcc must be >= 1: $heavyOcc")
    val docs = df.select(col(idCol).as("__id"), tokens.as("__tk"))
      .where(size(col("__tk")) > 0)
    val dAgg = broadcast(docs.agg(count(lit(1)).as("__D")))
    // pin the freq-joined token set BEFORE deriving per-doc weights from
    // it: docW and the final join both consume it, and unpinned each
    // consumer would re-run the explode + frequency join (measured 3.2×
    // the unweighted form at ×100 before this pin)
    val toksW0 = OpCaches.pin(withFreq(explodedTokens(docs)).crossJoin(dAgg)
      .withColumn("__w", microIdf))
    // per-doc total weight rides the rows the way __n does
    val docW = toksW0.groupBy("__id").agg(sum(col("__w")).as("__wn"))
    val toksF = OpCaches.pin(toksW0.join(docW.hint("merge"), Seq("__id")))
    val light = toksF.where(col("__f") <= heavyOcc)
    val heavy = toksF.where(col("__f") > heavyOcc)
    val lightSums = light.select(col("__t"), col("__w"),
        col("__id").as("id_a"), col("__wn").as("__wa"))
      .join(light.select(col("__t"), col("__id").as("id_b"), col("__wn").as("__wb"))
        .hint("merge"), Seq("__t"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "__wa", "__wb").agg(sum(col("__w")).as("__lw"))
    val heavyEmpty = heavyProbe && heavy.take(1).isEmpty
    val spine =
      if (heavyEmpty) lightSums
      else {
        val heavyDocs = heavy.select("__id").distinct()
        val prefix = weightedPrefixTokens(
          toksF.join(heavyDocs.hint("merge"), Seq("__id")), tNum, tDen)
        val cand = prefix.select(col("__t"), col("__id").as("id_a"), col("__wn").as("__wa"))
          .join(prefix.select(col("__t"), col("__id").as("id_b"), col("__wn").as("__wb"))
            .hint("merge"), Seq("__t"))
          .where(col("id_a") < col("id_b"))
          .select("id_a", "id_b", "__wa", "__wb").distinct()
          .withColumn("__lw", lit(0L))
        lightSums.unionByName(cand)
          .groupBy("id_a", "id_b", "__wa", "__wb").agg(max(col("__lw")).as("__lw"))
      }
    val withHeavy =
      if (heavyEmpty) spine.withColumn("inter_w", col("__lw"))
      else {
        val h = spine.select("id_a", "id_b")
          .join(heavy.select(col("__id").as("id_a"), col("__t"), col("__w"))
            .hint("merge"), Seq("id_a"))
          .join(heavy.select(col("__id").as("id_b"), col("__t")).hint("merge"),
            Seq("id_b", "__t"))
          .groupBy("id_a", "id_b").agg(sum(col("__w")).as("__hw"))
        spine.join(h.hint("merge"), Seq("id_a", "id_b"), "left_outer")
          .withColumn("inter_w", col("__lw") + coalesce(col("__hw"), lit(0L)))
      }
    withHeavy
      .withColumn("uni_w", col("__wa") + col("__wb") - col("inter_w"))
      .where(col("uni_w") > 0L && col("inter_w") * tDen >= col("uni_w") * tNum)
      .select("id_a", "id_b", "inter_w", "uni_w")
  }
}
