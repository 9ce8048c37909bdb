package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling and constraint checking — the Deequ-style audit
  * layer a warehouse runs BEFORE trusting a table (completeness,
  * uniqueness, referential integrity). The reference trusts its API
  * responses blindly (the F3 missing-id drop is its only data check); at
  * 100 TB ingest, constraint verification is a first-class pipeline stage
  * that must cost one scan, not one scan per metric.
  *
  * Scale posture: [[profile]] computes every per-column metric in ONE
  * aggregation over one table scan — null counts are conditional sums
  * riding the same hash-aggregate, exact distinct counts share Spark's
  * single expand pass (k+1 replicas of the projected columns, the
  * documented cost of exact multi-distinct; swap `countDistinct` for
  * `approx_count_distinct` when ±2% is acceptable and the expand
  * disappears). The one-row result unpivots driver-trivially through
  * `inline` (the thresholdSweep pattern). [[fkViolations]] is one
  * left-anti join on the key — broadcastable when the parent's key set
  * is dimension-sized, shuffle-hash otherwise; either way only KEYS ride
  * the exchange.
  */
object DataQuality {

  /** One-scan column profile: for each named column —
    * (column, n_rows, n_nulls, completeness, n_distinct).
    * Completeness is round(1 − nulls/rows, 6); distinct counts are exact
    * and EXCLUDE null (the SQL COUNT(DISTINCT col) convention both
    * engines share).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = count(lit(1)).as("__n") +:
      cols.flatMap { c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.map { c =>
      struct(lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"__null_$c").as("n_nulls"),
        round(lit(1.0) - col(s"__null_$c").cast("double") /
          greatest(col("__n"), lit(1L)).cast("double"), 6).as("completeness"),
        col(s"__dist_$c").as("n_distinct"))
    }: _*)
    one.select(inline(rows)).orderBy("column")
  }

  /** The 100-TB form of [[profile]]: identical one-scan shape, but the
    * distinct count is an `approx_count_distinct` HLL++ sketch (fixed
    *-width registers riding the same hash-aggregate) instead of the exact
    * multi-distinct — so the (k+1)-replica EXPAND pass disappears and the
    * scan cost is independent of how many columns are profiled. Exact
    * multi-distinct replicates every row k+1 times before the partial
    * aggregate and shuffles each column's full distinct key set; the
    * sketch shuffles a few KB per column regardless of cardinality. Use
    * this once the profiled table's expand no longer fits the scan budget
    * (measured crossover in SCALING.md); `rsd` is the sketch's target
    * relative standard deviation. Output column is `n_distinct_approx`
    * so callers cannot mistake the estimate for the exact count.
    */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profileApprox needs at least one column")
    val aggs: Seq[Column] = count(lit(1)).as("__n") +:
      cols.flatMap { c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        approx_count_distinct(col(c), rsd).as(s"__dist_$c"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.map { c =>
      struct(lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"__null_$c").as("n_nulls"),
        round(lit(1.0) - col(s"__null_$c").cast("double") /
          greatest(col("__n"), lit(1L)).cast("double"), 6).as("completeness"),
        col(s"__dist_$c").as("n_distinct_approx"))
    }: _*)
    one.select(inline(rows)).orderBy("column")
  }

  /** Referential-integrity check: one row
    * (n_child, n_orphans, ok) — child rows whose `childKey` has no match
    * in `parent.parentKey` (NULL child keys count as orphans: a NULL FK
    * cannot reference anything). One anti-join on keys + one scalar agg.
    */
  def fkViolations(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String): DataFrame = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).where(col(childKey).isNotNull),
        Seq(childKey), "left_anti")
    val n = child.agg(count(lit(1)).as("n_child"))
    val o = orphans.agg(count(lit(1)).as("n_orphans"))
    n.crossJoin(o).select(col("n_child"), col("n_orphans"),
      (col("n_orphans") === 0L).as("ok"))
  }

  /** Uniqueness check: one row (n_rows, n_distinct, n_duplicate_rows, ok)
    * for a candidate key — duplicates counted as rows beyond the first
    * per key value (NULL keys excluded, the COUNT(DISTINCT) convention).
    */
  def uniqueness(df: DataFrame, keyCol: String): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
        countDistinct(col(keyCol)).as("n_distinct"),
        (count(col(keyCol)) - countDistinct(col(keyCol))).as("n_duplicate_rows"))
      .withColumn("ok", col("n_duplicate_rows") === 0L)
}
