package graft.state

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 views over a versioned entity stream.
  *
  * The reference's cache is last-write-wins: committing a batch OVERWRITES
  * each entity's previous version (cache.js:50-58) and the history is gone.
  * A warehouse-grade state store keeps every version with its validity
  * interval — the SCD2 shape — so "what did this entity look like at time
  * T?" is answerable after the fact. These operators derive that view
  * declaratively from the raw version stream; the LWW head
  * (`k2_upsert_lww`) is exactly the `is_current` slice of [[history]].
  *
  * Scale posture: ONE hash exchange on the entity key, then a per-key
  * window whose depth is the entity's own version count (the
  * `w_sessionize` exchange class — never corpus-global). [[asOf]] pushes
  * its cutoff to the parquet scan via a raw-column predicate
  * ([[graft.functions.EventTime]] discipline) so row groups past the
  * cutoff are pruned before any shuffle.
  */
object Scd2 {

  /** Expand a version stream into SCD2 rows: each version carries
    * `valid_from_ms` (its own event time), `valid_to_ms` (the NEXT
    * version's event time, NULL on the head — half-open intervals
    * [from, to)), and `is_current`. Version order is (epoch-ms, tie)
    * ascending — ms-floored time, not raw sub-ms encoding, so the interval
    * bounds and the ordering agree with the emitted values whatever the
    * physical ts encoding.
    *
    * @param tsMs  event time as epoch millis (e.g. `EventTime.bind(df).ms`)
    * @param tie   total-order tiebreak within a key at equal ms (version id)
    */
  def history(df: DataFrame, keyCol: String, tsMs: Column, tie: Column,
              payload: Seq[String]): DataFrame = {
    val staged = df.select(col(keyCol) +: tie.as("__tie") +:
      tsMs.as("valid_from_ms") +: payload.map(col): _*)
    val w = Window.partitionBy(keyCol).orderBy(col("valid_from_ms").asc, col("__tie").asc)
    staged
      .withColumn("valid_to_ms", lead(col("valid_from_ms"), 1).over(w))
      .withColumn("is_current", col("valid_to_ms").isNull)
  }

  /** Point-in-time state: each entity's latest version with event time
    * ≤ `cutoffMs` — the LWW head the store WOULD have held at that moment.
    * `pushedCutoff` must be the raw-column form of the same cutoff
    * (e.g. `EventTime.bind(df).before(cutoffMs + 1)`) so the filter
    * reaches the scan; the ms values are recomputed from `tsMs` for the
    * window order and output.
    */
  def asOf(df: DataFrame, keyCol: String, tsMs: Column, tie: Column,
           pushedCutoff: Column, payload: Seq[String]): DataFrame = {
    val staged = df.where(pushedCutoff)
      .select(col(keyCol) +: tie.as("__tie") +: tsMs.as("ts_ms") +: payload.map(col): _*)
    val w = Window.partitionBy(keyCol).orderBy(col("ts_ms").desc, col("__tie").desc)
    staged
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }
}
