package graft

import graft.ops.Similarity
import graft.streaming.StreamingSemanticDecon
import graft.streaming.StreamingSemanticDecon.{Flagged, Vec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Stateless streaming semantic decontamination against a frozen benchmark
  * index: the streamed flag set must equal the batch
  * `semanticContaminationReport` — vector for vector, cosine for cosine.
  */
class StreamingSemanticDeconSpec extends SparkSpec {
  import spark.implicits._

  test("stream flag set equals the batch report on the fixture embeddings (values included)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bench = emb.where(col("vec_id") % 25 === 0)
    val corpus = emb.where(col("vec_id") % 25 =!= 0)
    val threshold = 0.3
    val batch = Similarity.semanticContaminationReport(corpus, bench,
        threshold, dim = 64, bands = 16, bitsPerBand = 8)
      .select("vec_id", "n_bench_hits", "max_cosine")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(batch.nonEmpty, "fixture produced no contaminated vectors at 0.3 — test is vacuous")

    val fb = StreamingSemanticDecon.freeze(bench, dim = 64, bands = 16, bitsPerBand = 8)
    assert(fb.size == bench.count())
    val rows = corpus.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().map { case (id, v) => Vec(id, v) }.toSeq

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Vec]
    val q = StreamingSemanticDecon.flagContaminated(input.toDS(), fb, threshold)
      .writeStream.format("memory").queryName("sdecon_out")
      .option("checkpointLocation", Files.createTempDirectory("sdecon-ckpt").toString)
      .outputMode("append").start()
    rows.grouped(13).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("sdecon_out").as[Flagged].collect()
      .map(f => f.vecId -> (f.nBenchHits, f.maxCosine)).toMap

    assert(streamed == batch)

    // the admission filter is the complement of the flag set
    val admitted = StreamingSemanticDecon.admitClean(rows.toDS(), fb, threshold)
      .collect().map(_.vecId).toSet
    assert(admitted == rows.map(_.vecId).toSet -- batch.keySet)
  }

  test("freeze rejects corpus-scale benchmarks; empty benchmark flags nothing") {
    val none = StreamingSemanticDecon.freeze(
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"), dim = 4)
    val out = StreamingSemanticDecon.flagContaminated(
      Seq(Vec(1L, Seq(1f, 0f, 0f, 0f))).toDS(), none, threshold = 0.0)
    assert(out.collect().isEmpty)
  }
}
