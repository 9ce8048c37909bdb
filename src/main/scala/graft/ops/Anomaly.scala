package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust metric anomaly detection — the modified z-score on median/MAD
  * (Iglewicz & Hoaglin's 3.5 rule): flag values whose distance from their
  * group's MEDIAN exceeds k times the median absolute deviation. Mean/
  * stddev outlier rules break exactly when needed most (the outliers drag
  * the mean); the median/MAD pair has a 50% breakdown point, which is why
  * monitoring stacks standardize on it for metric regression alarms —
  * here: per-event-type value anomalies on the ingest feed, the
  * continuous-valued complement of [[DataQuality]]'s boolean constraints.
  *
  * Determinism: both medians are 6-dp-rounded at the model boundary
  * (linear-interpolated exact percentile agrees across engines, but the
  * house discipline rounds every learned statistic before it re-enters
  * comparisons); the threshold multiplies the ROUNDED mad by a literal
  * double, so the flag boundary replays bit-for-bit in the twin.
  *
  * Scale shape: two grouped EXACT percentiles (each materializes its
  * group's values in the aggregation buffer — right for bounded group
  * counts with per-group volumes that fit an executor, the registered
  * event_type case) + one flagging scan against the broadcast group-stats
  * row set. For unbounded per-group volume swap `percentile` for
  * `approx_percentile` (t-digest riding the hash-aggregate, fixed memory)
  * — the [[DataQuality.profileApprox]] pairing, same trade.
  */
object Anomaly {

  /** k = 3.5 modified-z-score cut × 1.4826 MAD-to-σ consistency constant. */
  val DefaultK = 5.1891

  /** Per-group robust outlier report: (group, n, med, mad, n_outliers)
    * where n_outliers counts rows with |v − med| > k·mad. Groups with
    * mad = 0 (over half the values identical) flag every v ≠ med — the
    * rule's defined behavior, loud on frozen-metric feeds.
    */
  def madOutlierReport(df: DataFrame, groupCol: String, valueCol: String,
                       k: Double = DefaultK): DataFrame = {
    val v = col(valueCol)
    val med = df.groupBy(groupCol)
      .agg(round(expr(s"percentile($valueCol, 0.5)"), 6).as("med"))
    val stats = df.join(broadcast(med), Seq(groupCol))
      .groupBy(groupCol)
      .agg(first(col("med")).as("med"),
        round(expr(s"percentile(abs($valueCol - med), 0.5)"), 6).as("mad"))
    df.join(broadcast(stats), Seq(groupCol))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        first(col("med")).as("med"), first(col("mad")).as("mad"),
        sum(when(abs(v - col("med")) > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy(groupCol)
  }

  /** The 100-TB form of [[madOutlierReport]]: identical three-stage shape,
    * but both grouped percentiles are `approx_percentile` Greenwald–Khanna
    * sketches — fixed-size aggregation state per group (≤ accuracy
    * entries) instead of the exact percentile's full per-group value
    * buffer. Use this once per-group volumes no longer fit an executor's
    * aggregation budget (exact state grows with the group, sketch state
    * stays flat — measured, SCALING.md r10). The sketch guarantees the
    * returned value's RANK is within ±n/accuracy of the target rank —
    * that (not a value distance) is the accuracy contract the registered
    * gate asserts in-plan, because a rank bound does not translate to a
    * value bound on gappy distributions. Statistics are 6-dp-rounded at
    * the model boundary like every learned statistic here.
    */
  def madOutlierReportApprox(df: DataFrame, groupCol: String, valueCol: String,
                             k: Double = DefaultK,
                             accuracy: Int = 10000): DataFrame = {
    val v = col(valueCol)
    val med = df.groupBy(groupCol)
      .agg(round(expr(s"approx_percentile($valueCol, 0.5, $accuracy)"), 6)
        .as("med"))
    val stats = df.join(broadcast(med), Seq(groupCol))
      .groupBy(groupCol)
      .agg(first(col("med")).as("med"),
        round(expr(s"approx_percentile(abs($valueCol - med), 0.5, $accuracy)"), 6)
          .as("mad"))
    df.join(broadcast(stats), Seq(groupCol))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        first(col("med")).as("med"), first(col("mad")).as("mad"),
        sum(when(abs(v - col("med")) > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy(groupCol)
  }
}
