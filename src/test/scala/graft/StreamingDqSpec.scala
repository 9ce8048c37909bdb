package graft

import graft.streaming.StreamingDq
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The streaming constraint monitor's final counters must equal the batch
  * evaluation of the same rules row-for-row, whatever the batching; and
  * the update-mode state must be monotone (counters only grow).
  */
object StreamingDqSpec {
  // Top-level scope (not suite-nested): a case class nested inside the
  // suite captures an outer pointer, and its encoder then compiles broken
  // generated code (Janino CompileException, silent interpreted fallback).
  case class Ev(user_id: java.lang.Long, value: Double, props: String)
}

class StreamingDqSpec extends SparkSpec {
  import spark.implicits._
  import StreamingDqSpec.Ev

  test("stream monitor final counters equal the batch audit on fixture events") {
    // Pin codegen: with fallback off, a broken encoder (e.g. a suite-nested
    // case class) fails the test instead of silently running interpreted.
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try runMonitorTest()
    finally prevFallback match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  private def runMonitorTest(): Unit = {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"), col("value"), col("props"))
    val rows = ev.as[(Long, Double, String)].collect()
      .map { case (u, v, p) => Ev(u, v, p) }

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingDq.monitor(input.toDF())
      .writeStream.format("memory").queryName("dq_out")
      .option("checkpointLocation", Files.createTempDirectory("dq-ckpt").toString)
      .outputMode("complete").start()
    var lastViol = Map.empty[String, Long]
    rows.grouped(300).foreach { b =>
      input.addData(b.toSeq: _*); q.processAllAvailable()
      val now = spark.table("dq_out").select("constraint", "violations")
        .as[(String, Long)].collect().toMap
      lastViol.foreach { case (c, v) =>
        assert(now(c) >= v, s"counter for $c went backwards: ${now(c)} < $v")
      }
      lastViol = now
    }
    q.stop()
    val streamed = spark.table("dq_out")
      .select("constraint", "n", "violations").as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val batch = StreamingDq.monitor(ev)
      .select("constraint", "n", "violations").as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(batch.keySet == Set("events_user_id_present", "events_value_nonneg",
      "events_props_has_id"))
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(batch.values.forall(_._1 == rows.length), "every rule sees every row")
  }
}
