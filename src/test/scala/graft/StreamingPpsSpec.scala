package graft

import graft.ops.{Sampling, TextAnalysis}
import graft.streaming.StreamingAdmission.Doc
import graft.streaming.{StreamingPps, StreamingQuota}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Stateless streaming PPS admission against a frozen corpus-total
  * snapshot: the stream's admitted set must equal the batch
  * `Sampling.ppsSample` draw on the same corpus, weight for weight —
  * the exact-integer rule leaves no rounding to diverge on.
  */
class StreamingPpsSpec extends SparkSpec {
  import spark.implicits._

  test("stream admission set equals the batch PPS draw on the fixture corpus") {
    val docsDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w = TextAnalysis.tokenCount(col("text")).cast("long")
    val totalW = docsDf.agg(sum(w)).as[Long].head() // the frozen snapshot
    val n = 60L

    val batchKeep = Sampling.ppsSample(docsDf, "doc_id", w, n)
      .select("doc_id").as[Long].collect().toSet
    assert(batchKeep.nonEmpty && batchKeep.size < docsDf.count(),
      "fixture draw must genuinely split the corpus")

    val srcDocs = docsDf.select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => Doc(id, t) }.toSeq
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingPps.admitByDraw(input.toDS(), StreamingQuota.tokenCount, totalW, n)
      .writeStream.format("memory").queryName("pps_out")
      .option("checkpointLocation", Files.createTempDirectory("pps-ckpt").toString)
      .outputMode("append").start()
    srcDocs.grouped(40).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("pps_out").as[Doc].collect().map(_.docId).toSet
    assert(streamed == batchKeep, "stream draw diverged from the batch draw")
  }
}
