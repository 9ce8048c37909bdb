package graft

import graft.ops.Similarity
import graft.streaming.StreamingAnnServe
import graft.streaming.StreamingAnnServe.Query
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming ANN serving over a frozen IVF-PQ index: results streamed
  * through the stream-static cell join must be BIT-EQUAL to the batch
  * `Similarity.ivfPqTopK` — neighbor for neighbor, cosine for cosine.
  */
class StreamingAnnServeSpec extends SparkSpec {
  import spark.implicits._

  test("served top-k equals batch IVF-PQ on the fixture embeddings (values included)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") % 100 === 0)
    val batch = Similarity.ivfPqTopK(queries, emb, k = 5, nProbe = 3, dim = 64,
        bitsPerCell = 4, m = 8, bitsPerCode = 4)
      .select("query_id", "neighbor_id", "rank", "approx_cosine")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._3) -> (r._2, r._4)).toMap
    assert(batch.nonEmpty)

    val fz = StreamingAnnServe.freeze(emb, dim = 64, bitsPerCell = 4, m = 8, bitsPerCode = 4)
    assert(fz.nCells > 1, "fixture should occupy several coarse cells")
    val index = StreamingAnnServe.codedIndex(emb, fz)

    val qRows = queries.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().map { case (id, v) => Query(id, v) }.toSeq

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Query]
    val q = StreamingAnnServe.serveTopK(input.toDS(), index, fz, k = 5, nProbe = 3)
      .writeStream.format("memory").queryName("ann_serve_out")
      .option("checkpointLocation", Files.createTempDirectory("annserve-ckpt").toString)
      .outputMode("complete").start()
    // two arrival waves: per-query results must not depend on batching
    qRows.grouped(3).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val served = spark.table("ann_serve_out")
      .select("query_id", "neighbor_id", "rank", "approx_cosine")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._3) -> (r._2, r._4)).toMap
    assert(served == batch)
  }
}
