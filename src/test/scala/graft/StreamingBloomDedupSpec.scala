package graft

import graft.streaming.{StreamingBloomDedup, StreamingDedup}
import graft.streaming.StreamingBloomDedup.{Admitted, Doc}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Bloom-guarded streaming dedup: bounded state, zero false negatives
  * (no duplicate ever admitted twice), and bit-exact agreement with the
  * driver-side reference fold — including its false positives.
  */
class StreamingBloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[Doc]], mBits: Int, k: Int, shards: Int): Seq[Admitted] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val name = s"bloom_out_${System.nanoTime()}"
    val q = StreamingBloomDedup.admitFirstSeen(input.toDS(), mBits, k, shards)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("bloom-ckpt").toString)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[Admitted].collect().toSeq
  }

  test("ample filter: admitted set equals exact first-seen dedup; duplicates suppressed across batches") {
    val batches = Seq(
      Seq(Doc(1, "the quick brown fox"), Doc(2, "jumps over the lazy dog")),
      Seq(Doc(3, "THE  quick Brown fox "), // dup of 1 modulo normalization
          Doc(4, "completely new content here")),
      Seq(Doc(5, "jumps over the lazy dog"), // dup of 2
          Doc(6, "the quick brown fox"))     // dup of 1 again
    )
    val out = run(batches, mBits = 1 << 16, k = 5, shards = 8)
    assert(out.map(_.docId).sorted == Seq(1L, 2L, 4L))
    // no content key appears twice in the admitted set (zero false negatives)
    assert(out.map(_.keyMd5).distinct.length == out.length)
    // with an ample filter there are no false positives either: matches
    // the EXACT streaming dedup on the same feed
    val exact = batches.flatten.map(d => StreamingDedup.normalize(d.text)).distinct.length
    assert(out.length == exact)
  }

  test("streamed admission replays the reference fold bit-for-bit (including false positives)") {
    // a deliberately tiny filter (64 bits/shard, 1 shard) over 40 unique
    // docs MUST produce false positives; the stream and the driver-side
    // reference fold must still agree exactly, and no dup may pass
    val docs = (1 to 40).map(i => Doc(i.toLong, s"unique document number $i with content"))
    val batches = docs.grouped(7).map(_.toSeq).toSeq
    val mBits = 64; val k = 3; val shards = 1
    val streamed = run(batches, mBits, k, shards)
    val reference = StreamingBloomDedup.referenceAdmit(batches, mBits, k, shards)
    assert(streamed.sortBy(_.docId) == reference.sortBy(_.docId))
    // saturation really happened: some uniques were wrongly dropped ...
    assert(streamed.length < docs.length, "tiny filter produced no false positives?")
    // ... but early arrivals passed (filter starts empty)
    assert(streamed.map(_.docId).contains(1L))
  }

  test("in-batch tiebreak is keep-min by docId; shard routing is stable") {
    val dupA = "same content arriving many times"
    val out = run(Seq(Seq(Doc(9, dupA), Doc(3, dupA), Doc(7, dupA))),
      mBits = 1 << 12, k = 4, shards = 4)
    assert(out.map(_.docId) == Seq(3L))
    val key = StreamingBloomDedup.contentKey(dupA)
    assert(out.head.shard == StreamingBloomDedup.shardOf(key, 4))
    assert(out.head.keyMd5 == key)
  }

  test("bit positions: deterministic, in range, k distinct probes for odd step") {
    val key = StreamingBloomDedup.contentKey("abc def")
    val pos = StreamingBloomDedup.bitPositions(key, mBits = 1 << 10, k = 8)
    assert(pos.length == 8 && pos.forall(p => p >= 0 && p < (1 << 10)))
    assert(pos.sameElements(StreamingBloomDedup.bitPositions(key, 1 << 10, 8)))
  }
}
