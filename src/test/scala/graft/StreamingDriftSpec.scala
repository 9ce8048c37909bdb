package graft

import graft.ops.Drift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming drift monitoring: [[Drift.binCounts]] runs UNCHANGED on a
  * live feed (update-mode groupBy count — state = bins counter rows
  * forever), and the PSI computed from the streamed histogram against a
  * frozen reference must equal the batch [[Drift.psiReport]] bit-for-bit
  * once the feed is fully ingested.
  */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  test("streamed bin counts compose to the batch PSI bit-for-bit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def half(r: Int) = graft.ops.TextAnalysis
      .qualityMetrics(docs.where(col("doc_id") % 2 === r), "doc_id", col("text"))
      .select(col("quality_score"))
    val ref = half(0)
    val curRows = half(1).as[Double].collect()

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Double]
    val q = Drift.binCounts(input.toDF().select(col("value").as("quality_score")),
        "quality_score", "cur_count")
      .writeStream.format("memory").queryName("drift_out")
      .option("checkpointLocation", Files.createTempDirectory("drift-ckpt").toString)
      .outputMode("complete").start()
    curRows.grouped(120).foreach { b => input.addData(b.toSeq: _*); q.processAllAvailable() }
    q.stop()
    val streamedCounts = spark.table("drift_out")

    val viaStream = Drift.psiFromCounts(
        Drift.binCounts(ref, "quality_score", "ref_count"), streamedCounts)
      .select("bin", "ref_count", "cur_count", "psi_term", "psi")
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    val batch = Drift.psiReport(ref, half(1), "quality_score")
      .select("bin", "ref_count", "cur_count", "psi_term", "psi")
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(viaStream == batch, s"stream-composed PSI != batch: $viaStream vs $batch")
    assert(batch.map(_._3).sum == curRows.length, "streamed histogram saw every row")
  }
}
