package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming metric-anomaly monitor — the ingestion-time form of
  * [[graft.ops.Anomaly.madOutlierReport]], split the same way the drift
  * monitor splits PSI ([[graft.ops.Drift]]): the robust statistics
  * (median/MAD) are FIT on a frozen reference sample — they cannot be
  * maintained incrementally without order statistics over the full
  * history — and the live feed is flagged against the frozen thresholds
  * by a stateless projection + one update-mode counter aggregate. The
  * monitoring-fleet contract: alarm on |v − med| > k·mad counts NOW,
  * refit the reference nightly (and PSI-watch the feature itself for
  * when the reference goes stale).
  *
  * Scale shape: the stats table is groups-sized (broadcast in the
  * stream-static join); streaming state = ONE counter row per group,
  * forever — the StreamingDq bounded-state class.
  */
object StreamingAnomaly {

  /** Running (group, n, n_outliers) counters of the live feed against
    * frozen (group, med, mad) stats. Update-mode sink sees the latest
    * counters per micro-batch; end-of-feed counters equal the batch
    * report's on the same rows (spec-pinned).
    */
  def monitor(stream: DataFrame, frozenStats: DataFrame, groupCol: String,
              valueCol: String, k: Double = graft.ops.Anomaly.DefaultK): DataFrame =
    stream.join(broadcast(frozenStats.select(col(groupCol), col("med"), col("mad"))),
        Seq(groupCol))
      .select(col(groupCol),
        when(abs(col(valueCol) - col("med")) > lit(k) * col("mad"), 1L)
          .otherwise(0L).as("__o"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum(col("__o")).as("n_outliers"))
}
