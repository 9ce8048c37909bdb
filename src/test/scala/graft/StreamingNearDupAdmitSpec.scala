package graft

import graft.ops.Dedup
import graft.streaming.StreamingNearDupAdmit
import graft.streaming.StreamingNearDupAdmit.Doc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming incremental near-dup admission: verdicts streamed through the
  * stream-static band join against a frozen corpus must equal the batch
  * `Dedup.incrementalNearDupAdmit` corpus_dup column doc-for-doc, and must
  * not depend on arrival batching. Re-sent docs emit no second verdict.
  */
class StreamingNearDupAdmitSpec extends SparkSpec {
  import spark.implicits._

  test("stream verdicts equal batch corpus_dup on the fixture documents, across waves") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.where(col("doc_id") % 2 === 0).select("doc_id", "text")
    val incoming = docs.where(col("doc_id") % 2 === 1).limit(60).select("doc_id", "text")

    // batch truth: only the corpus_dup half — within-batch screening is a
    // separate operator in the streaming decomposition
    val batch = Dedup.incrementalNearDupAdmit(incoming, corpus, "doc_id", col("text"))
      .select("doc_id", "corpus_dup").as[(Long, Boolean)].collect().toMap
    graft.ops.OpCaches.release()
    assert(batch.nonEmpty)
    assert(batch.values.exists(identity), "fixture must contain at least one corpus dup")
    assert(!batch.values.forall(identity), "fixture must contain admitted docs too")

    val banded = StreamingNearDupAdmit.frozenCorpusBands(corpus, "doc_id", col("text"))
    val inDocs = incoming.as[(Long, String)].collect().map { case (id, t) => Doc(id, t) }.toSeq

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingNearDupAdmit.admissionStream(input.toDS(), banded)
      .writeStream.format("memory").queryName("admit_out")
      .option("checkpointLocation", Files.createTempDirectory("admit-ckpt").toString)
      .outputMode("append").start()
    // three arrival waves + a re-send of the first wave (must not re-emit)
    val waves = inDocs.grouped(25).toSeq
    waves.foreach { w => input.addData(w: _*); q.processAllAvailable() }
    input.addData(waves.head: _*); q.processAllAvailable()
    q.stop()

    val out = spark.table("admit_out").select("docId", "corpus_dup")
      .as[(Long, Boolean)].collect()
    assert(out.length == inDocs.length, "exactly one verdict per doc, re-sends ignored")
    assert(out.toMap == batch)
  }
}
