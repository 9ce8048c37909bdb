package graft

import graft.ops.Sequences
import org.apache.spark.sql.functions._

/** Sequence building: (ts, tie) total order, cap-before-collect (the
  * whale-user guard), and the one-exchange plan (window and groupBy share
  * the key).
  */
class SequencesSpec extends SparkSpec {
  import spark.implicits._

  test("X7sq order, tie-break, and truncation semantics") {
    val ev = Seq(
      (1L, 10L, 100L, "a"), (1L, 11L, 100L, "b"), // same ts: event_id breaks tie
      (1L, 12L, 50L, "c"),                        // earliest
      (2L, 20L, 10L, "x"), (2L, 21L, 20L, "y"), (2L, 22L, 30L, "z")
    ).toDF("user_id", "event_id", "ts_ms", "event_type")
    val out = Sequences.buildSequences(ev, "user_id", col("ts_ms"), "event_id",
        col("event_type"), maxLen = 2)
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, "c a")), out(1L).toString) // ts 50 first, then tie a<b
    assert(out(2L) == ((2L, 2L, "x y")), out(2L).toString) // truncated at 2
  }

  test("X7sq plans ONE exchange: window and collect share the user key") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val df = Sequences.buildSequences(ev, "user_id",
      graft.functions.EventTime.bind(ev).ms, "event_id", col("event_type"), 32)
    val plan = df.queryExecution.executedPlan.toString()
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected one user-keyed exchange shared by window + agg:\n$plan")
  }
}
