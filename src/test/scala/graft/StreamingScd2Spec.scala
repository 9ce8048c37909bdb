package graft

import graft.streaming.StreamingScd2
import graft.streaming.StreamingScd2.{Closed, Ver}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The streaming SCD2 interval closer must equal the batch history's
  * CLOSED subset row-for-row on an event-time-ordered feed, however the
  * rows are batched; the open heads (batch `is_current` slice) are never
  * emitted.
  */
class StreamingScd2Spec extends SparkSpec {
  import spark.implicits._

  test("stream interval-close equals the batch Scd2.history closed subset on fixture events") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val et = graft.functions.EventTime.bind(ev)
    val rows = ev
      .select(col("user_id"), col("event_id"), et.ms.as("ts_ms"),
        col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect()
      .map { case (u, id, ts, tpe, v) => Ver(u, id, ts, tpe, v) }
      .sortBy(v => (v.tsMs, v.eventId)) // event-time-ordered feed

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ver]
    val q = StreamingScd2.closeIntervals(input.toDS())
      .writeStream.format("memory").queryName("scd2_out")
      .option("checkpointLocation", Files.createTempDirectory("scd2-ckpt").toString)
      .outputMode("append").start()
    rows.grouped(150).foreach { b => input.addData(b.toSeq: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("scd2_out").as[Closed].collect()
      .map(c => c.eventId -> ((c.userId, c.validFromMs, c.validToMs))).toMap

    val batch = graft.state.Scd2.history(ev, "user_id", et.ms, col("event_id"),
        Seq("event_type", "value"))
      .where(col("valid_to_ms").isNotNull)
      .select(col("__tie"), col("user_id"), col("valid_from_ms"), col("valid_to_ms"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, u, f, t) => id -> ((u, f, t)) }.toMap

    assert(batch.nonEmpty, "fixture must contain superseded versions")
    assert(streamed == batch,
      s"closed intervals diverge: onlyStream=${(streamed.toSet -- batch.toSet).take(3)} " +
        s"onlyBatch=${(batch.toSet -- streamed.toSet).take(3)}")
    // open heads stay in state: per key, exactly one version is never closed
    val nKeys = rows.map(_.userId).distinct.length
    assert(rows.length - streamed.size == nKeys, "one open head per key")
  }

  test("equal-ms versions close in id order; in-batch disorder is re-sorted") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ver]
    val q = StreamingScd2.closeIntervals(input.toDS())
      .writeStream.format("memory").queryName("scd2_edge")
      .option("checkpointLocation", Files.createTempDirectory("scd2-ckpt2").toString)
      .outputMode("append").start()
    // sent out of order within the batch; fold must replay (ts, id) order
    input.addData(
      Ver(1L, 102L, 40L, "b", 2.0),
      Ver(1L, 101L, 40L, "a", 1.0),
      Ver(1L, 100L, 10L, "z", 0.0))
    q.processAllAvailable()
    input.addData(Ver(1L, 103L, 50L, "c", 3.0)) // closes 102 across batches
    q.processAllAvailable()
    q.stop()
    val out = spark.table("scd2_edge").as[Closed].collect()
      .map(c => c.eventId -> ((c.validToMs, c.closedById))).toMap
    assert(out == Map(
      100L -> ((40L, 101L)), // oldest closed by the LOWER equal-ms id first
      101L -> ((40L, 102L)), // zero-width interval at the tied ms, id order
      102L -> ((50L, 103L))), out.toString)
  }
}
