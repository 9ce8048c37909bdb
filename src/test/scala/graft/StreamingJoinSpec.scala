package graft

import graft.streaming.StreamingJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The native stream-stream interval join must equal the batch inner join
  * with the same range predicate pair-for-pair once both inputs are fully
  * ingested (an inner interval join is watermark-insensitive at the end of
  * input), regardless of how the rows are batched.
  */
object StreamingJoinSpec {
  // top-level (not suite-nested) so the encoder compiles under codegen
  // instead of silently falling back to interpreted mode
  case class Row3(user_id: Long, event_id: Long, ts_ms: Long)
}

class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._
  import StreamingJoinSpec.Row3

  private val Tol = 2L * 3600 * 1000

  test("stream-stream interval join equals the batch range join on the fixture events") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val et = graft.functions.EventTime.bind(ev)
    def side(tpe: String) = ev.where(col("event_type") === tpe)
      .select(col("user_id"), col("event_id"), et.ms.as("ts_ms"))
    val clicks = side("click").as[(Long, Long, Long)].collect()
      .map { case (u, id, ts) => Row3(u, id, ts) }.sortBy(_.ts_ms)
    val purchases = side("purchase").as[(Long, Long, Long)].collect()
      .map { case (u, id, ts) => Row3(u, id, ts) }.sortBy(_.ts_ms)

    implicit val sqlCtx = spark.sqlContext
    val cIn = MemoryStream[Row3]
    val pIn = MemoryStream[Row3]
    val q = StreamingJoin.intervalJoin(
        cIn.toDF(), pIn.toDF(), toleranceMs = Tol, delayMs = 3600_000L)
      .writeStream.format("memory").queryName("ssj_out")
      .option("checkpointLocation", Files.createTempDirectory("ssj-ckpt").toString)
      .outputMode("append").start()
    // interleaved waves on both sides, including a final click-only wave —
    // pairs must not depend on arrival batching
    val cw = clicks.grouped(60).toSeq
    val pw = purchases.grouped(60).toSeq
    (0 until math.max(cw.size, pw.size)).foreach { i =>
      if (i < cw.size) cIn.addData(cw(i).toSeq: _*)
      if (i < pw.size) pIn.addData(pw(i).toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("ssj_out")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet

    val batch = side("purchase").as("p").join(side("click").as("c"),
        col("p.user_id") === col("c.user_id") &&
          col("c.ts_ms") >= col("p.ts_ms") - Tol && col("c.ts_ms") <= col("p.ts_ms"))
      .select(col("p.event_id"), col("c.event_id")).as[(Long, Long)].collect().toSet

    assert(batch.nonEmpty, "fixture must produce qualifying pairs")
    assert(streamed == batch,
      s"stream pairs != batch pairs: only-stream=${(streamed -- batch).take(5)} " +
        s"only-batch=${(batch -- streamed).take(5)}")
  }

  test("inclusive boundaries and multi-pair fan-out; out-of-window clicks drop") {
    implicit val sqlCtx = spark.sqlContext
    val cIn = MemoryStream[Row3]
    val pIn = MemoryStream[Row3]
    val q = StreamingJoin.intervalJoin(
        cIn.toDF(), pIn.toDF(), toleranceMs = 100L, delayMs = 1000L)
      .writeStream.format("memory").queryName("ssj_edge")
      .option("checkpointLocation", Files.createTempDirectory("ssj-ckpt2").toString)
      .outputMode("append").start()
    cIn.addData(
      Row3(1L, 10L, 900L),  // exactly tolerance old: inclusive lower bound
      Row3(1L, 11L, 1000L), // simultaneous: inclusive upper bound
      Row3(1L, 12L, 1001L), // after the purchase: excluded
      Row3(1L, 13L, 899L),  // 101ms old: excluded
      Row3(2L, 14L, 1000L)) // other user: excluded
    pIn.addData(Row3(1L, 20L, 1000L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ssj_edge")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(out == Set((20L, 10L), (20L, 11L)), out.toString)
  }
}
