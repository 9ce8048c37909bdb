package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the most recent right
  * row with `rightTs <= leftTs` on the same key; null when no right row
  * precedes. The operator Spark lacks natively (SURVEY.md §2.12 family);
  * composed Spark-first instead of translated: both sides are tagged and
  * unioned, ONE hash exchange on the key co-locates them, and a running
  * `last(right_payload, ignoreNulls)` over (ts, side, tie) picks the match
  * — no join node, no per-row range probe, no candidate blow-up on hot
  * keys (a naive `leftTs >= rightTs` theta-join fans out quadratically per
  * key before its argmax).
  *
  * Scale shape: cost is the union shuffle plus a per-key sort — identical
  * to any windowed aggregation at 100 TB; skewed keys salt exactly like
  * other window ops ([[Skew]]).
  *
  * Determinism: right rows tied on `rightTs` resolve to the greatest
  * `tieBreak` value (sorted last in the frame). Left rows at the same
  * instant as a right row DO see it (inclusive `<=`: side orders right
  * before left within a timestamp).
  */
object AsOf {

  /** Left rows + a struct column `asof` holding the matched right row's
    * payload (all right columns except the key), or null when nothing
    * precedes. `leftTs`/`rightTs` must be mutually comparable (same scale);
    * `tieBreak` is a right-side column ordering ties on equal `rightTs`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTs: Column, rightTs: Column, tieBreak: Column): DataFrame =
    asofCore(left, right, keyCol, leftTs, rightTs, tieBreak, None)

  /** As-of join with a staleness bound — the attribution-window variant
    * every time-series store ships (kdb+ `wj`, pandas `merge_asof
    * tolerance`): a match more than `toleranceMs` older than the left
    * timestamp is treated as NO match (`asof` = null) — "credit the last
    * click, but only within 2 hours". Same plan as [[asofJoin]]: the
    * bound adds ONE more windowed `last` over the identical frame (the
    * matched row's timestamp) plus a null-out projection — no extra
    * exchange, no join node. The bound is inclusive:
    * `matchedTs >= leftTs - toleranceMs` keeps the match.
    */
  def asofJoinWithin(left: DataFrame, right: DataFrame, keyCol: String,
                     leftTs: Column, rightTs: Column, tieBreak: Column,
                     toleranceMs: Long): DataFrame = {
    require(toleranceMs >= 0, s"toleranceMs must be >= 0: $toleranceMs")
    asofCore(left, right, keyCol, leftTs, rightTs, tieBreak, Some(toleranceMs))
  }

  private def asofCore(left: DataFrame, right: DataFrame, keyCol: String,
                       leftTs: Column, rightTs: Column, tieBreak: Column,
                       toleranceMs: Option[Long]): DataFrame = {
    val rpay = struct(right.columns.filter(_ != keyCol).map(col): _*)
    val lpay = struct(left.columns.map(col): _*)
    val rType = right.select(rpay.as("p")).schema("p").dataType
    val lType = left.select(lpay.as("p")).schema("p").dataType
    // SQL join semantics for NULLs: a NULL key never matches anything, and
    // a right row with NULL ts precedes nothing. Unfiltered, the window
    // would group NULL keys into one partition (NULL-keyed lefts silently
    // attributed to NULL-keyed rights) and NULL ts would sort first,
    // acting as "earlier than everything" — both diverge from the
    // equivalent theta-join + argmax (and its oracle twin), which yields
    // no match. Same NULL-grouping class as the hotColdJoin fix.
    val ru = right
      .where(col(keyCol).isNotNull && rightTs.cast("long").isNotNull)
      .select(col(keyCol).as("__k"), rightTs.cast("long").as("__t"),
        lit(0).as("__side"), tieBreak.cast("long").as("__tb"),
        rpay.as("__r"), lit(null).cast(lType).as("__l"))
    val lu = left.select(col(keyCol).as("__k"), leftTs.cast("long").as("__t"),
      lit(1).as("__side"), lit(null).cast("long").as("__tb"),
      lit(null).cast(rType).as("__r"), lpay.as("__l"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = ru.unionByName(lu)
      .withColumn("__m", last("__r", ignoreNulls = true).over(w))
    toleranceMs match {
      case None =>
        matched.where(col("__side") === 1)
          .select(col("__l.*") +: Seq(col("__m").as("asof")): _*)
      case Some(tol) =>
        // the matched row's OWN timestamp, picked by the same frame order
        // as __m (both `last ignoreNulls` resolve to the same right row)
        matched
          .withColumn("__mt",
            last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))
          .where(col("__side") === 1)
          .select(col("__l.*") +: Seq(
            when(col("__mt") >= col("__t") - tol, col("__m")).as("asof")): _*)
    }
  }
}
