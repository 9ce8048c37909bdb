package graft

import graft.streaming.StreamingSequences
import graft.streaming.StreamingSequences.{Assign, Ev}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming sequence assignment: re-assembled assignments must equal the
  * batch buildSequences output user-for-user at end of feed, whatever the
  * batching; positions are immutable and emitted exactly once; events past
  * the cap emit nothing.
  */
class StreamingSequencesSpec extends SparkSpec {
  import spark.implicits._

  test("stream assignments reassemble into the batch sequences on fixture events") {
    val evDf = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val et = graft.functions.EventTime.bind(evDf)
    val maxLen = 8
    val batch = graft.ops.Sequences.buildSequences(evDf, "user_id", et.ms,
        "event_id", col("event_type"), maxLen)
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // event-time-ordered feed (the W3 contract), batched mid-user
    val rows = evDf.select(col("user_id"), col("event_id"), et.ms.as("ts"),
        col("event_type")).as[(Long, Long, Long, String)].collect()
      .sortBy(r => (r._3, r._2))
      .map { case (u, id, ts, tok) => Ev(u, id, ts, tok) }

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingSequences.assignments(input.toDS(), maxLen)
      .writeStream.format("memory").queryName("seq_out")
      .option("checkpointLocation", Files.createTempDirectory("seq-ckpt").toString)
      .outputMode("append").start()
    rows.grouped(137).foreach { b => input.addData(b.toSeq: _*); q.processAllAvailable() }
    q.stop()

    val assigns = spark.table("seq_out").as[Assign].collect()
    assert(assigns.map(a => (a.userId, a.rn)).distinct.length == assigns.length,
      "each (user, position) assigned exactly once")
    val streamed = assigns.groupBy(_.userId).map { case (u, as) =>
      u -> ((as.length.toLong, as.sortBy(_.rn).map(_.token).mkString(" ")))
    }
    assert(streamed == batch,
      s"stream-reassembled sequences differ from batch for users " +
        s"${(streamed.keySet ++ batch.keySet).filter(k => streamed.get(k) != batch.get(k)).take(5)}")
  }
}
