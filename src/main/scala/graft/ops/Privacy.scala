package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-anonymity over quasi-identifiers — the governance gate a training
  * corpus carrying user-derived metadata has to pass before release: a
  * row is re-identifiable when its combination of quasi-identifier values
  * (region, segment, coarse account bucket, ...) is shared by fewer than
  * k rows, PII scrubbing notwithstanding (Sweeney's linkage result: the
  * quasi-tuple IS the identifier). Suppression nulls the quasi columns of
  * every row in an equivalence class smaller than k, leaving k-anonymous
  * output.
  *
  * Plan shape at scale: ONE hash-partition shuffle on the quasi-tuple —
  * the class size is a `count(*) OVER (PARTITION BY quasi...)` window, so
  * suppression needs no groupBy-plus-join-back second shuffle and no
  * driver state; the audit is the matching one-level aggregate. A heavily
  * skewed class (one giant equivalence class) lands on one partition, but
  * a count-only window over it is a single running pass — no buffering of
  * the class in memory (count requires no ordering, so Spark plans an
  * unbounded frame evaluated as one partition-wide constant).
  */
object Privacy {

  /** Per-row suppression: rows whose quasi-tuple class has fewer than k
    * members get every quasi column nulled and `suppressed` = true;
    * `class_size` travels for auditability. NULL quasi values group as a
    * class of their own (SQL window partitioning semantics — NULLs
    * compare equal for grouping in both Spark and the twin engine).
    */
  def suppressBelowK(df: DataFrame, quasi: Seq[String], k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    val w = Window.partitionBy(quasi.map(col): _*)
    val sized = df.withColumn("class_size", count(lit(1)).over(w))
    val isSmall = col("class_size") < k
    quasi.foldLeft(sized)((d, q) =>
        d.withColumn(q, when(isSmall, lit(null)).otherwise(col(q))))
      .withColumn("suppressed", isSmall)
  }

  /** One-row audit: (n_rows, n_classes, n_violating_classes,
    * n_rows_at_risk, min_class_size) — what a release gate checks before
    * shipping the table.
    */
  def kAnonymityAudit(df: DataFrame, quasi: Seq[String], k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("__sz"))
      .agg(sum(col("__sz")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        sum(when(col("__sz") < k, 1L).otherwise(0L)).as("n_violating_classes"),
        sum(when(col("__sz") < k, col("__sz")).otherwise(0L)).as("n_rows_at_risk"),
        min(col("__sz")).as("min_class_size"))
  }
}
