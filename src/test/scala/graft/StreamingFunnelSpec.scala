package graft

import graft.ops.AsOf
import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.{Attribution, Ev}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming funnel attribution must equal the batch as-of tolerance join
  * purchase-for-purchase when the feed respects event-time order across
  * batches (in-batch disorder is re-sorted by the processor).
  */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val Tol = 2L * 3600 * 1000

  test("stream attribution equals the batch asofJoinWithin on the fixture events") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val et = graft.functions.EventTime.bind(ev)
    val rows = ev.where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), et.ms.as("ts_ms"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
      .map { case (u, id, ts, tpe) => Ev(u, id, ts, tpe) }
      // event-time-ordered feed, clicks before purchases at equal ts
      .sortBy(e => (e.tsMs, if (e.eventType == "click") 0 else 1, e.eventId))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingFunnel.attribute(input.toDS(), Tol)
      .writeStream.format("memory").queryName("funnel_out")
      .option("checkpointLocation", Files.createTempDirectory("funnel-ckpt").toString)
      .outputMode("append").start()
    rows.grouped(120).foreach { b => input.addData(b.toSeq: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("funnel_out").as[Attribution].collect()
      .map(a => a.purchaseId -> ((a.clickId, a.clickTsMs))).toMap

    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), et.ms.as("ts_ms"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), et.ms.as("click_ts_ms"))
    val batch = AsOf.asofJoinWithin(purchases, clicks, "user_id",
        col("ts_ms"), col("click_ts_ms"), col("click_id"), toleranceMs = Tol)
      .select(col("event_id"), col("asof.click_id"), col("asof.click_ts_ms"))
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (p, c, t) => p -> ((c, t)) }.toMap

    assert(streamed.keySet == batch.keySet, "every purchase must be attributed exactly once")
    assert(streamed == batch)
    val converted = streamed.values.count(_._1.isDefined)
    assert(converted > 0 && converted < streamed.size,
      "fixture must exercise both converted and unconverted purchases")
  }

  test("re-sent purchases re-emit deterministically; simultaneous click attributes inclusively") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingFunnel.attribute(input.toDS(), toleranceMs = 100L)
      .writeStream.format("memory").queryName("funnel_edge")
      .option("checkpointLocation", Files.createTempDirectory("funnel-ckpt2").toString)
      .outputMode("append").start()
    input.addData(
      Ev(1L, 10L, 1000L, "click"),
      Ev(1L, 11L, 1000L, "click"),     // tied ts -> greatest id (11) wins
      Ev(1L, 20L, 1000L, "purchase"),  // simultaneous: inclusive boundary sees the click
      Ev(2L, 30L, 1000L, "purchase"))  // no click at all -> unattributed
    q.processAllAvailable()
    input.addData(Ev(1L, 21L, 1200L, "purchase")) // click now 200ms old > 100ms tol -> stale
    q.processAllAvailable()
    q.stop()
    val out = spark.table("funnel_edge").as[Attribution].collect()
      .map(a => a.purchaseId -> a.clickId).toMap
    assert(out == Map(20L -> Some(11L), 30L -> None, 21L -> None), out.toString)
  }
}
