package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key ordered SEQUENCE building — turning an event log into the
  * behavioral training examples a sequence model consumes (user-history
  * pretraining, next-event prediction, session recommendation). The
  * reference stores entities keyed by id (`cache.js:53`); the model-side
  * consumer of the same feed needs each key's HISTORY as one ordered
  * record, which is a transpose the warehouse pays for at every training
  * export.
  *
  * Scale shape: truncation happens BEFORE collection — a row_number
  * window caps each key at `maxLen` events, then the grouped collect
  * assembles only capped lists, so no aggregation buffer ever holds an
  * unbounded history (the whale-user trap: one robot key with 10^8
  * events would otherwise materialize a 10^8-element array in one
  * executor). Window and groupBy share the key, so Catalyst plans ONE
  * exchange for both. Order inside a key is (ts, tieCol) — total and
  * engine-portable; the same (rn, token) pairs sort identically anywhere.
  */
object Sequences {

  /** (key, n_events, seq): the first `maxLen` tokens of each key's
    * event stream in (ts, tie) order, space-joined; n_events is the
    * CAPPED count (= length of seq in tokens).
    */
  def buildSequences(df: DataFrame, keyCol: String, tsMs: Column,
                     tieCol: String, token: Column, maxLen: Int): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive: $maxLen")
    import org.apache.spark.sql.expressions.Window
    df.select(col(keyCol), col(tieCol), tsMs.as("__ts"), token.as("__tok"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyCol).orderBy(col("__ts"), col(tieCol))))
      .where(col("__rn") <= maxLen)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_events"),
        array_join(
          transform(array_sort(collect_list(struct(col("__rn"), col("__tok")))),
            x => x.getField("__tok")),
          " ").as("seq"))
  }
}
