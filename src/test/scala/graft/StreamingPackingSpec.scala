package graft

import graft.ops.Packing
import graft.streaming.StreamingPacking
import graft.streaming.StreamingPacking.{Doc, Placed}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming sequence packing: placement offsets continue across
  * micro-batches (state = one long per shard), a priority-order feed
  * reproduces the batch operator bit-for-bit, zero-token docs are dropped.
  */
class StreamingPackingSpec extends SparkSpec {
  import spark.implicits._

  private val SeqLen = 16L

  private def run(batches: Seq[Seq[Doc]]): Seq[Placed] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val name = s"pack_out_${System.nanoTime()}"
    val q = StreamingPacking.placementStream(input.toDS(), SeqLen)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("pack-ckpt").toString)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[Placed].collect().toSeq
  }

  private def doc(shard: String, id: Long, nTok: Int) =
    Doc(shard, id, ("tok " * nTok).trim)

  test("a priority-order feed reproduces the batch placement bit-for-bit") {
    val docs = (0L until 40L).map(i => doc(s"s${i % 2}", i, 3 + (i % 7).toInt))
    // feed in the batch operator's (hashUnit, id) priority order, chunked
    // into 4 arrival batches that respect that order per shard
    val ordered = docs.sortBy(d => (StreamingPacking.hashUnit(d.docId), d.docId))
    val batches = ordered.grouped(10).toSeq
    val streamed = run(batches)
      .map(p => (p.shard, p.docId, p.nTokens, p.startOffset, p.firstSeq, p.lastSeq)).toSet
    val batch = Packing.concatChunkPack(
        docs.toDF("shard", "doc_id", "text").select($"doc_id", $"shard", $"text"),
        "doc_id", $"text", SeqLen, Seq("shard"))
      .select($"shard", $"doc_id", $"n_tokens", $"start_offset", $"first_seq", $"last_seq")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("offsets continue across micro-batches; arrival order wins across batches") {
    val out = run(Seq(
      Seq(doc("g", 5, 10)),          // placed first despite higher id
      Seq(doc("g", 1, 10)),          // arrives later -> offset 10
      Seq(doc("h", 2, 20))           // other shard starts at 0
    ))
    val g = out.filter(_.shard == "g").sortBy(_.startOffset)
    assert(g.map(_.docId) == Seq(5L, 1L))
    assert(g.map(_.startOffset) == Seq(0L, 10L))
    // doc 1 spans the 16-token boundary: tokens [10, 20) -> seqs 0..1
    assert(g.last.firstSeq == 0L && g.last.lastSeq == 1L)
    val h = out.filter(_.shard == "h")
    assert(h.map(_.startOffset) == Seq(0L) && h.head.lastSeq == 1L)
  }

  test("zero-token documents occupy no positions and are dropped") {
    val out = run(Seq(Seq(doc("g", 1, 4), Doc("g", 2, "   "), doc("g", 3, 4))))
    assert(out.map(_.docId).sorted == Seq(1L, 3L))
    assert(out.map(_.nTokens).sum == 8L)
  }
}
