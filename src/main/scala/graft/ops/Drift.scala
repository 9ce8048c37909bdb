package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-drift monitoring — the Population Stability Index
  * (PSI = Σ_bins (p−q)·ln(p/q), the standard credit-scoring / ML-ops
  * drift statistic): has the distribution of a model feature moved
  * between a REFERENCE sample (training time) and the CURRENT stream?
  * The quality filters ([[Classify]]) are fit once and applied for
  * months; at 100 TB/day ingest the cheap invariant to watch is the
  * FEATURE DISTRIBUTION, and PSI > 0.2 is the conventional "retrain"
  * alarm.
  *
  * Scale shape: each side is ONE scan → fixed-width binning (a pure
  * projection) → a `bins`-row count aggregate with map-side combine;
  * everything after the two aggregates is bins-sized (≤ tens of rows).
  *
  * Determinism: bin = least(floor(v·bins), bins−1) is the same IEEE
  * double product + floor in any engine; shares are add-one-smoothed
  * exact-integer ratios (c+1)/(n+bins) divided in double (identical
  * operands ⇒ identical quotients); each PSI term rounds 6 dp before
  * the exact-DECIMAL sum (ln agrees to 1 ulp — the house model-boundary
  * discipline), so the per-bin terms AND the total replay bit-for-bit.
  */
object Drift {

  /** Per-bin PSI report for a [0,1]-bounded metric: one row per bin —
    * (bin, ref_count, cur_count, psi_term) — plus the scalar `psi` total
    * carried on every row (the bins-bounded unpartitioned-window pattern).
    * Empty bins participate through the smoothing floor, so the index is
    * defined even for disjoint distributions.
    */
  def psiReport(ref: DataFrame, cur: DataFrame, valueCol: String,
                bins: Int = 10): DataFrame =
    psiFromCounts(binCounts(ref, valueCol, "ref_count", bins),
      binCounts(cur, valueCol, "cur_count", bins), bins)

  /** Fixed-width bin counts of a [0,1]-bounded metric — the ONE
    * corpus-scale stage of [[psiReport]]. Works unchanged on a STREAMING
    * frame (a plain groupBy count in update mode, state = `bins` counter
    * rows forever): the streaming drift monitor is this stage on the live
    * feed composed with [[psiFromCounts]] against a frozen reference
    * histogram — see StreamingDriftSpec.
    *
    * Out-of-range values CLAMP into the edge bins (v < 0 → bin 0,
    * v ≥ 1 → bin bins−1) rather than producing phantom bins that would
    * fall off the spine join in [[psiFromCounts]] — a violated [0,1]
    * contract therefore shows up as edge-bin drift instead of silently
    * vanishing from both the counts and the PSI total. NULLs are the one
    * excluded class (no defensible bin exists for them); they count into
    * neither histogram, same as a NULL feature is skipped at scoring time.
    *
    * The clamp is a when-chain, NOT least/greatest: Spark's least/greatest
    * SKIP nulls (least(null, 9) = 9), which would silently file NULLs into
    * the top bin; and the NULL drop happens AFTER the aggregate (one extra
    * group row) rather than as a pre-filter — a filter on a computed
    * metric column gets pushed into the scoring chain and evaluates it
    * twice (measured 1.8× on the drift query).
    */
  def binCounts(df: DataFrame, valueCol: String, out: String,
                bins: Int = 10): DataFrame = {
    // stage the metric in its OWN projection first: the when-chain below
    // references it three times, and `when` branches defeat codegen
    // subexpression elimination — without the stage, an expensive computed
    // metric (the quality-score chain) runs 3× per row (measured 2.2×
    // end-to-end). CollapseProject keeps the stage: it never inlines a
    // non-cheap alias referenced more than once.
    val staged = df.select(col(valueCol).as("__v"))
    val raw = floor(col("__v") * bins) // null in → null out
    staged.select(when(raw < 0, lit(0)).when(raw > bins - 1, lit(bins - 1))
        .otherwise(raw).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(out))
      .where(col("bin").isNotNull)
  }

  /** The bins-sized tail of [[psiReport]]: spine join + smoothed shares +
    * 6-dp terms + exact-decimal total, from two (bin, count) tables.
    */
  def psiFromCounts(refCounts: DataFrame, curCounts: DataFrame,
                    bins: Int = 10): DataFrame = {
    require(bins > 1, s"need at least 2 bins: $bins")
    val spine = broadcast(
      refCounts.sparkSession.range(bins).select(col("id").cast("int").as("bin")))
    val joined = spine
      .join(refCounts, Seq("bin"), "left")
      .join(curCounts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("ref_count"), lit(0L)).as("ref_count"),
        coalesce(col("cur_count"), lit(0L)).as("cur_count"))
    // totals over the bins-sized table: unpartitioned window bounded by
    // `bins` rows (the Domains/charTrigram carry-the-totals pattern)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
    val p = (col("ref_count") + 1).cast("double") /
      (sum(col("ref_count")).over(w) + bins).cast("double")
    val q = (col("cur_count") + 1).cast("double") /
      (sum(col("cur_count")).over(w) + bins).cast("double")
    joined
      .withColumn("psi_term", round((p - q) * log(p / q), 6))
      .withColumn("psi",
        round(sum(col("psi_term").cast(DecimalType(18, 6))).over(w).cast("double"), 6))
      .orderBy("bin")
  }
}
