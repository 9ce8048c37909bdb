package graft

import graft.ops.Sketches
import graft.streaming.StreamingRankAdmit
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

object StreamingRankAdmitSpec {
  case class Doc(id: Long, score: Double)
}

class StreamingRankAdmitSpec extends SparkSpec {
  import spark.implicits._
  import StreamingRankAdmitSpec.Doc

  test("stream admission == batch filter under the same frozen sketch; admits ~top (1-q)") {
    // historical distribution: skewed scores
    val hist = spark.range(100000)
      .select(lit(0L).as("g"), pow(col("id") % 1000, 2.0).as("v"))
    val sketch = Sketches.qsUnionSketch(
        Sketches.qsGroupSketches(hist, col("g"), col("v"), relativeError = 0.001))
      .select("sketch").as[Array[Byte]].head()
    val q = 0.8
    // arrivals drawn from the same generator, different phase
    val arrivals = (0 until 30000).map(i =>
      Doc(i.toLong, math.pow(((i * 2654435761L) % 1000L).toDouble, 2.0)))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = StreamingRankAdmit.admitAbove(input.toDF(), col("score"), sketch, q)
      .writeStream.format("memory").queryName("rank_admit_out")
      .option("checkpointLocation", Files.createTempDirectory("ra-ckpt").toString)
      .outputMode("append").start()
    arrivals.grouped(11000).foreach { b => input.addData(b.toSeq: _*); out.processAllAvailable() }
    out.stop()
    val streamed = spark.table("rank_admit_out").select("id").as[Long].collect().toSet
    val batch = StreamingRankAdmit.admitAbove(arrivals.toDF(), col("score"), sketch, q)
      .select("id").as[Long].collect().toSet
    assert(streamed == batch, "stream verdicts diverged from the batch filter")
    // admitted fraction ≈ 1 - q within the sketch error + generator drift
    val frac = streamed.size.toDouble / arrivals.size
    assert(math.abs(frac - (1 - q)) < 0.02, s"admitted fraction $frac vs expected ${1 - q}")
    // every admitted score is above every rejected score's neighborhood:
    // the threshold is a single cut value (monotone admission)
    val admitted = arrivals.filter(d => streamed(d.id)).map(_.score)
    val rejected = arrivals.filter(d => !streamed(d.id)).map(_.score)
    assert(admitted.min >= rejected.max - 1e-9, "admission cut is not monotone in score")
  }
}
