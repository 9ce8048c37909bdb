package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming data-quality monitor — the ingestion-time form of
  * [[graft.ops.DataQuality]]: running constraint counters maintained by
  * Spark's BUILT-IN streaming aggregation (update mode), no custom state.
  * A batch audit tells you yesterday's table was bad; the monitor flags
  * the violating INGEST while it happens — the missing-id / range-rule
  * checks the reference applies per page (`app.js:50`, F3) lifted to a
  * continuously-maintained report.
  *
  * Scale shape: per-row flag projection (map-only, codegen'd), then one
  * streaming hash-aggregate keyed by constraint name — state is ONE row
  * of counters per constraint, forever, regardless of stream volume (the
  * smallest bounded-state class in the family). Per micro-batch the
  * exchange carries partial counter rows only.
  */
object StreamingDq {

  /** Running (constraint, n, violations) counters over an event stream:
    * null-key rule (`user_id IS NOT NULL`), range rule (`value >= 0`),
    * and payload-id rule (props carries a `"k"` field — the reference's
    * F3 missing-id check). Update-mode sink sees the latest counters
    * after every micro-batch; the final state equals the batch audit's
    * counts row-for-row.
    */
  def monitor(events: DataFrame): DataFrame = {
    val flags = events.select(
      array(
        struct(lit("events_user_id_present").as("constraint"),
          when(col("user_id").isNull, 1L).otherwise(0L).as("v")),
        struct(lit("events_value_nonneg").as("constraint"),
          when(col("value") < 0.0, 1L).otherwise(0L).as("v")),
        struct(lit("events_props_has_id").as("constraint"),
          when(regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1) === "", 1L)
            .otherwise(0L).as("v"))).as("__f"))
      .select(explode(col("__f")).as("__c"))
      .select(col("__c.constraint").as("constraint"), col("__c.v").as("__v"))
    flags.groupBy("constraint")
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("violations"))
  }
}
