package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Native watermarked stream-stream interval join — the one streaming join
  * shape the family did not yet exercise. [[StreamingFunnel]] holds custom
  * per-user state to emit the as-of HEAD (latest click only); this operator
  * instead emits EVERY qualifying (purchase, click) pair within the
  * tolerance window using Spark's built-in symmetric-hash streaming join —
  * no custom state at all. The funnel's head is the argmax slice of this
  * relation, so the two operators bracket the design space: built-in join
  * when the full pair relation is wanted, hand state when only a bounded
  * digest of it is.
  *
  * Scale shape: both sides carry an event-time watermark and the join
  * condition bounds `click.ts` to `[purchase.ts − tolerance, purchase.ts]`,
  * which is exactly what Spark's `StreamingSymmetricHashJoinExec` needs to
  * derive state-eviction bounds — each side's join state holds only rows
  * younger than (watermark − tolerance), i.e. a sliding window of the
  * stream, NEVER the stream's history. The key exchange is the same
  * user-hash shuffle as the batch interval join (`ops/Intervals.scala`);
  * per-key state is the user's own recent activity.
  *
  * Batch equivalence: inner-joining the same two frames with the same
  * range predicate (see StreamingJoinSpec) — pair-for-pair, because an
  * inner interval join is watermark-insensitive once both inputs are
  * fully ingested.
  */
object StreamingJoin {

  /** Join two event streams carrying (user_id, event_id, ts_ms) so that
    * every right-side row pairs with every left-side row of the same user
    * with `left.ts ∈ [right.ts − toleranceMs, right.ts]` (inclusive both
    * ends — the reference CDC family's inclusive-boundary discipline).
    *
    * Output: (user_id, purchase_id, purchase_ts_ms, click_id, click_ts_ms)
    * — "click"/"purchase" naming for the left/right roles, matching the
    * funnel's vocabulary.
    *
    * @param delayMs allowed event-time disorder (watermark delay) on both
    *                sides; join state is bounded by delay + tolerance.
    */
  def intervalJoin(clicks: DataFrame, purchases: DataFrame,
                   toleranceMs: Long, delayMs: Long): DataFrame = {
    val c = clicks.select(
        col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts_ms").as("click_ts_ms"),
        timestamp_millis(col("ts_ms")).as("c_ts"))
      .withWatermark("c_ts", s"$delayMs milliseconds")
    val p = purchases.select(
        col("user_id"), col("event_id").as("purchase_id"),
        col("ts_ms").as("purchase_ts_ms"),
        timestamp_millis(col("ts_ms")).as("p_ts"))
      .withWatermark("p_ts", s"$delayMs milliseconds")
    p.join(c,
        col("user_id") === col("c_user_id") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $toleranceMs milliseconds") &&
          col("c_ts") <= col("p_ts"))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts_ms"),
        col("click_id"), col("click_ts_ms"))
  }
}
