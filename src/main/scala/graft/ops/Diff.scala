package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the "what changed between yesterday's load
  * and today's" audit (added / removed / changed / unchanged per primary
  * key). The reference's incremental scan TRUSTS `updatedOnMs` to name
  * every change (`app.js:48-59`); a warehouse verifying that contract, or
  * migrating a pipeline, diffs the two materialized snapshots directly —
  * the check that catches silent updates, lost deletes, and re-keyed rows
  * that timestamp-based CDC misses by construction.
  *
  * Scale posture: ONE full-outer equi-join on the key — the exchange
  * carries keys plus only the compared columns; the per-row status is a
  * codegen'd null-safe comparison chain (`<=>` per column, no hashing, so
  * engines agree bit-for-bit and NULL↔value transitions count as
  * changes). With both snapshots bucketed by the key — the natural layout
  * for a table maintained by key — the join plans shuffle-free; the
  * summary is a 4-row aggregate. Never a collect, never a row hash that
  * would tie the result to one engine's hash function.
  */
object Diff {

  /** Per-key diff of two same-schema snapshots: (key, status) where
    * status ∈ added (in `b` only), removed (in `a` only), changed (both,
    * any non-key column differs under null-safe compare), unchanged.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    val cols = a.columns.filter(_ != key).toSeq
    require(b.columns.toSet == a.columns.toSet,
      s"snapshots must share a schema: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val la = a.select(col(key) +: lit(true).as("__ina") +:
      cols.map(c => col(c).as(s"__a_$c")): _*)
    val lb = b.select(col(key) +: lit(true).as("__inb") +:
      cols.map(c => col(c).as(s"__b_$c")): _*)
    val same = cols.map(c => col(s"__a_$c") <=> col(s"__b_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    la.join(lb, Seq(key), "full_outer")
      .select(col(key),
        when(col("__ina").isNull, lit("added"))
          .when(col("__inb").isNull, lit("removed"))
          .when(same, lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** The audit-report form: (status, n) counts over [[snapshotDiff]] —
    * one 4-row aggregate after the join.
    */
  def diffSummary(a: DataFrame, b: DataFrame, key: String): DataFrame =
    snapshotDiff(a, b, key)
      .groupBy("status").agg(count(lit(1)).as("n"))
      .orderBy("status")
}
