package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (bounded range) join — pairs (l, r) on the same key with
  * `r.ts` in `(l.ts, l.ts + windowMs]`. A naive `l.ts < r.ts <=
  * l.ts + w` theta-join plans as a per-key nested loop (quadratic on hot
  * keys); instead both sides are equi-joined on (key, coarse bucket of
  * width `windowMs`): any qualifying right row lands in the left row's
  * bucket or the next one, so the left side fans out exactly 2× and the
  * join is an ordinary hash/sort-merge equi-join with the residual range
  * predicate applied after — the standard binning formulation of a range
  * join. At 100 TB the fan-out is a constant 2, never data-dependent.
  */
object Intervals {

  /** Left rows paired with every right row on the same key within
    * `(leftTs, leftTs + windowMs]`. `leftTsCol` / `rightTsCol` name
    * non-negative epoch columns at the same scale; all other column names
    * must be disjoint across the two frames (besides `keyCol`).
    */
  def windowJoin(left: DataFrame, right: DataFrame, keyCol: String,
                 leftTsCol: String, rightTsCol: String, windowMs: Long): DataFrame = {
    require(windowMs > 0, "windowMs must be positive")
    // INTEGER division, not floor(double /): above 2^53 a double rounds the
    // epoch before dividing (nanosecond epochs are ~1.8e18), which can push
    // a boundary row into the wrong bucket so the equi-join never pairs it
    // — a silently missing result the residual predicate would have kept.
    // `div` is exact for longs and equals floor for the contract's
    // non-negative inputs.
    def bucketOf(c: String) = expr(s"CAST(`$c` AS BIGINT) div $windowMs")
    val lb = bucketOf(leftTsCol)
    val l = left.withColumn("__b", explode(array(lb, lb + 1)))
    val r = right.withColumn("__b", bucketOf(rightTsCol))
    l.join(r, Seq(keyCol, "__b"))
      .where(col(rightTsCol) > col(leftTsCol) &&
        col(rightTsCol) <= col(leftTsCol) + windowMs)
      .drop("__b")
  }
}
