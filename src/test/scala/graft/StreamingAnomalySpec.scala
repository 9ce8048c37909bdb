package graft

import graft.streaming.StreamingAnomaly
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

object StreamingAnomalySpec {
  // top-level (not suite-nested) so the encoder compiles under codegen
  case class Ev(event_type: String, value: Double)
}

/** The streaming anomaly monitor's final counters must equal the batch
  * flagging of the same rows against the same frozen stats, whatever the
  * batching; counters are monotone across batches.
  */
class StreamingAnomalySpec extends SparkSpec {
  import spark.implicits._
  import StreamingAnomalySpec.Ev

  test("stream counters equal batch flagging against frozen reference stats") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_type"), col("value"))
    // reference = the fixture itself; the live feed = fixture plus planted
    // spikes, so outlier counts are non-trivially > 0
    val stats = graft.ops.Anomaly.madOutlierReport(ev, "event_type", "value")
      .select("event_type", "med", "mad")
    stats.cache().count()
    val feed = ev.as[(String, Double)].collect().map { case (t, v) => Ev(t, v) } ++
      Seq(Ev("click", 1e9), Ev("click", -1e9), Ev("purchase", 5e8))

    val batchCounts = StreamingAnomaly.monitor(ev.sparkSession.createDataset(feed.toSeq).toDF(),
        stats, "event_type", "value")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(batchCounts.values.map(_._2).sum >= 3, s"planted spikes must flag: $batchCounts")

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingAnomaly.monitor(input.toDF(), stats, "event_type", "value")
      .writeStream.format("memory").queryName("anom_out")
      .option("checkpointLocation", Files.createTempDirectory("anom-ckpt").toString)
      .outputMode("complete").start()
    var last = Map.empty[String, Long]
    feed.grouped(211).foreach { b =>
      input.addData(b.toSeq: _*); q.processAllAvailable()
      val now = spark.table("anom_out").select("event_type", "n_outliers")
        .as[(String, Long)].collect().toMap
      last.foreach { case (g, v) =>
        assert(now.getOrElse(g, 0L) >= v, s"counter for $g went backwards")
      }
      last = now
    }
    q.stop()
    val streamed = spark.table("anom_out").as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(streamed == batchCounts, s"stream $streamed != batch $batchCounts")
    stats.unpersist(blocking = true) // shared session: leave no cached blocks
  }
}
