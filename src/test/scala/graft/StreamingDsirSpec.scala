package graft

import graft.ops.Dsir
import graft.streaming.StreamingAdmission.Doc
import graft.streaming.StreamingDsir
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Stateless streaming DSIR admission against a frozen ratio model: the
  * stream's admitted set must equal the batch
  * `Dsir.score(...).where(dsir_score >= floor)` keep set on the same
  * corpus — gram for gram, rounding for rounding.
  */
class StreamingDsirSpec extends SparkSpec {
  import spark.implicits._

  test("stream admission set equals the batch score-floor keep set on the fixture corpus") {
    val docsDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val target = docsDf.where(col("doc_id") % 20 === 0)
    val source = docsDf.where(col("doc_id") % 20 =!= 0)
    val buckets = 512
    val ratios = Dsir.fitLogRatios(target, source, "doc_id", col("text"), buckets)
    val frozen = StreamingDsir.freezeRatios(ratios)
    assert(frozen.size == buckets)

    val scored = Dsir.score(source, "doc_id", col("text"), ratios, buckets)
    // floor at the batch median score so the gate genuinely splits
    val floor = scored.stat.approxQuantile("dsir_score", Array(0.5), 0.0).head
    val batchKeep = scored.where(col("dsir_score") >= floor)
      .select("doc_id").as[Long].collect().toSet
    graft.ops.OpCaches.release()

    val srcDocs = source.select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => Doc(id, t) }.toSeq
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDsir.admitByScore(input.toDS(), frozen, buckets, floor)
      .writeStream.format("memory").queryName("dsir_out")
      .option("checkpointLocation", Files.createTempDirectory("dsir-ckpt").toString)
      .outputMode("append").start()
    srcDocs.grouped(40).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("dsir_out").as[Doc].collect().map(_.docId).toSet

    assert(streamed == batchKeep)
    assert(streamed.nonEmpty && streamed.size < srcDocs.size)
  }

  test("JVM score twin matches the batch column math on hand-built docs (incl. gramless)") {
    val target = Seq((100L, "spark catalyst optimizer rules")).toDF("doc_id", "text")
    val source = Seq(
      (1L, "spark catalyst rules"),
      (2L, "cooking pasta tonight"),
      (3L, "   ")).toDF("doc_id", "text") // gramless after normalization
    val buckets = 64
    val ratios = Dsir.fitLogRatios(target, source, "doc_id", col("text"), buckets)
    val frozen = StreamingDsir.freezeRatios(ratios)
    val batch = Dsir.score(source, "doc_id", col("text"), ratios, buckets)
      .select("doc_id", "dsir_score").as[(Long, Double)].collect().toMap
    graft.ops.OpCaches.release()
    assert(StreamingDsir.score("spark catalyst rules", frozen, buckets).contains(batch(1L)))
    assert(StreamingDsir.score("cooking pasta tonight", frozen, buckets).contains(batch(2L)))
    assert(!batch.contains(3L)) // batch drops gramless docs
    assert(StreamingDsir.score("   ", frozen, buckets).isEmpty) // twin agrees
  }
}
