package graft

import graft.ops.Dedup
import graft.streaming.StreamingCorpusOverlap
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming corpus-overlap sketch must equal the batch signature
  * estimate after every arrival wave — min is append-monotone, so the
  * stream's 64-long state IS the batch aggregate, not an approximation of
  * it.
  */
class StreamingCorpusOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("running stream estimate equals the batch estimate after every wave") {
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ref = fixture.where($"doc_id" % 2 === 0)          // frozen corpus
    val incoming = fixture.where($"doc_id" % 2 =!= 0)      // the streamed crawl
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq

    val refSig = StreamingCorpusOverlap.referenceSignature(ref, "doc_id", col("text"))
    assert(refSig.length == 64)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingCorpusOverlap.overlapAgainst(
        input.toDF().toDF("doc_id", "text"), "doc_id", col("text"), refSig)
      .writeStream.format("memory").queryName("ovl_out")
      .outputMode("complete").start()

    val waves = incoming.grouped(90).toSeq
    var seen = Seq.empty[(Long, String)]
    waves.foreach { wave =>
      input.addData(wave: _*)
      q.processAllAvailable()
      seen ++= wave
      val streamed = spark.table("ovl_out")
        .select("est_jaccard").as[Double].head()
      val batch = Dedup.corpusOverlapEstimate(
          ref, seen.toDF("doc_id", "text"), "doc_id", col("text"))
        .select("est_jaccard").as[Double].head()
      assert(streamed == batch, s"wave ${seen.size}: stream $streamed vs batch $batch")
    }
    q.stop()
    // the full-corpus estimate matches the registered batch operator's view
    val full = Dedup.corpusOverlapEstimate(ref,
        incoming.toDF("doc_id", "text"), "doc_id", col("text"))
      .select("est_jaccard").as[Double].head()
    val last = spark.table("ovl_out").select("est_jaccard").as[Double].head()
    assert(last == full)
    assert(full > 0.0, "fixture corpora share shingles; a zero estimate means the sketch broke")
  }
}
