package graft

import graft.ops.{Dedup, OpCaches}
import graft.streaming.StreamingNearDup
import graft.streaming.StreamingNearDup.{CandidatePair, Doc}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming MinHash-LSH near-dup: the candidate-pair set (dedup'd across
  * band multiplicity) must equal the batch operator's output on the same
  * fixture, including estimated-Jaccard values, regardless of how the
  * stream is split into micro-batches.
  */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    Doc(1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    Doc(2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    Doc(3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
    Doc(4L, "completely different content about spark catalyst optimizer internals rules"),
    Doc(5L, "  The  QUICK brown fox jumps over the lazy dog near the river bank today ")
  )

  test("stream equals batch on a shared fixture, across micro-batch splits") {
    val batch = Dedup.minhashNearDupPairs(
        docs.toDF("docId", "text"), "docId", col("text"), threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    OpCaches.release()
    assert(batch.nonEmpty) // fixture sanity: the dup cluster must collide

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingNearDup.candidatePairsStream(input.toDS(), threshold = 0.5)
      .writeStream.format("memory").queryName("neardup_out")
      .option("checkpointLocation", Files.createTempDirectory("nd-ckpt").toString)
      .outputMode("append").start()
    // split the corpus mid-cluster: 1 and 3 arrive one batch before 2/4/5,
    // so cross-batch pairing must come from state, not the same batch
    input.addData(docs.take(2).map(d => d): _*)
    q.processAllAvailable()
    input.addData(docs.drop(2): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("neardup_out").as[CandidatePair].collect()
      .map(p => (p.idA, p.idB, p.estJaccard)).toSet // Set = the documented dedup
    assert(streamed == batch)
  }

  test("RHP embedding stream equals batch pairs incl. cosines, across micro-batch splits") {
    import graft.ops.Similarity
    import graft.streaming.StreamingNearDup.{Vec, VecPair}
    // deterministic fixture with planted near-dups: base vectors plus noisy
    // copies (same md5-derived construction style as the ops specs)
    def unit(seed: Int): Array[Float] = Array.tabulate(8) { i =>
      (((seed * 31 + i) * 2654435761L) % 1000).toFloat / 1000f - 0.5f
    }
    val vecs = (0 until 12).map { s =>
      val base = unit(s % 4) // 4 clusters of 3 -> within-cluster near-dups
      Vec(s.toLong, base.zipWithIndex.map { case (x, i) => x + 0.01f * ((s / 4) * (i % 3)) })
    }
    val df = vecs.map(v => (v.vecId, v.embedding.toSeq)).toDF("vec_id", "embedding")
    val batch = Similarity.randomHyperplaneNearDupPairs(df, threshold = 0.8, dim = 8)
      .as[(Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty) // fixture sanity: clusters must collide

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Vec]
    val q = StreamingNearDup.vecPairsStream(input.toDS(), threshold = 0.8, dim = 8)
      .writeStream.format("memory").queryName("rhp_out")
      .option("checkpointLocation", Files.createTempDirectory("rhp-ckpt").toString)
      .outputMode("append").start()
    // split mid-cluster: cross-batch pairs must come from bucket state
    input.addData(vecs.take(5): _*)
    q.processAllAvailable()
    input.addData(vecs.drop(5): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("rhp_out").as[VecPair].collect()
      .map(p => (p.idA, p.idB, p.cosine)).toSet // Set = the documented dedup
    assert(streamed == batch)
  }

  test("signature twin matches the batch Column pipeline per document") {
    val jvm = docs.map(d => d.docId -> StreamingNearDup.signature(d.text, 64, 3).toSeq).toMap
    val col64 = Dedup.minhashSignaturesExploded(
        Dedup.explodedShingles(docs.toDF("docId", "text"), "docId", col("text"), 3), "docId", 64)
      .as[(Long, Seq[Long])].collect().toMap
    assert(jvm == col64)
  }
}
