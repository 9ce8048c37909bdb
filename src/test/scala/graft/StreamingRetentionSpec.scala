package graft

import graft.streaming.StreamingRetention
import graft.streaming.StreamingRetention.{Ev, Touch}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Summed first-touch increments from the stream must equal the batch
  * retention matrix cell for cell: the bitmask makes each (user, day)
  * increment exactly once regardless of event volume or re-delivery of
  * later same-day events.
  */
class StreamingRetentionSpec extends SparkSpec {
  import spark.implicits._

  test("stream touch counts equal the batch (cohort, offset) matrix on the fixture events") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val et = graft.functions.EventTime.bind(ev)
    val rows = ev.select(col("user_id"), et.ms.as("ts_ms"))
      .as[(Long, Long)].collect()
      .map { case (u, ts) => Ev(u, ts) }
      .sortBy(_.tsMs) // event-time-ordered feed (W3 assumption)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingRetention.touches(input.toDS())
      .writeStream.format("memory").queryName("ret_out")
      .option("checkpointLocation", Files.createTempDirectory("ret-ckpt").toString)
      .outputMode("append").start()
    rows.grouped(150).foreach { b => input.addData(b.toSeq: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("ret_out").as[Touch].collect()
      .groupBy(t => (t.cohortDay, t.dayOffset)).view.mapValues(_.length.toLong).toMap

    val batch = SparkEntry.queries("q11_retention")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
      .map { case (c, o, n) => (c, o) -> n }.toMap

    assert(streamed == batch, s"matrix mismatch: stream ${streamed.size} cells vs batch ${batch.size}")
    assert(batch.values.sum > batch.size, "fixture must have multi-user cells")
  }

  test("same-day re-activity increments once; out-of-order and far-horizon days fail loudly") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingRetention.touches(input.toDS())
      .writeStream.format("memory").queryName("ret_edge")
      .option("checkpointLocation", Files.createTempDirectory("ret-ckpt2").toString)
      .outputMode("append").start()
    val day = 86400000L
    input.addData(Ev(1L, 10 * day), Ev(1L, 10 * day + 5), Ev(1L, 12 * day))
    q.processAllAvailable()
    input.addData(Ev(1L, 12 * day + 9)) // later batch, same day: suppressed by the mask
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ret_edge").as[Touch].collect().toSeq.sortBy(t => (t.cohortDay, t.dayOffset))
    assert(out == Seq(Touch(10L, 0L), Touch(10L, 2L)), out.toString)
  }
}
