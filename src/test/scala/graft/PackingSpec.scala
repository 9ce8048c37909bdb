package graft

import graft.ops.Packing
import org.apache.spark.sql.functions._

/** Packing placement invariants: contiguous offsets, correct chunk spans,
  * exact occupancy accounting.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 120L).map { i =>
    (i, s"s${i % 3}", ("w " * (1 + (i % 23).toInt)).trim)
  }.toDF("doc_id", "source", "text")

  test("offsets are contiguous and deterministic within each shard") {
    val placed = Packing.concatChunkPack(docs, "doc_id", $"text", seqLen = 16L, Seq("source"))
    val rows = placed.orderBy("source", "start_offset")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    rows.groupBy(_._1).foreach { case (_, shard) =>
      var expect = 0L
      shard.foreach { case (_, _, nt, off, first, last) =>
        assert(off == expect, "gap or overlap in the packed stream")
        assert(first == off / 16 && last == (off + nt - 1) / 16)
        expect = off + nt
      }
    }
    // rerun is bit-identical
    val again = Packing.concatChunkPack(docs, "doc_id", $"text", seqLen = 16L, Seq("source"))
      .orderBy("source", "start_offset")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows == again)
  }

  test("occupancy: every sequence but a shard's last is exactly full") {
    val placed = Packing.concatChunkPack(docs, "doc_id", $"text", seqLen = 16L, Seq("source"))
    val occ = Packing.sequenceOccupancy(placed, seqLen = 16L, Seq("source"))
      .as[(String, Long, Long, Long)].collect().toSeq
    val totalPlaced = placed.agg(sum("n_tokens")).head().getLong(0)
    assert(occ.map(_._4).sum == totalPlaced) // every token lands in exactly one sequence
    occ.groupBy(_._1).foreach { case (_, shard) =>
      val bySeq = shard.sortBy(_._2)
      // sequence ids are dense 0..n
      assert(bySeq.map(_._2) == (0L until bySeq.length.toLong))
      bySeq.init.foreach { case (_, _, _, nt) => assert(nt == 16L) }
      assert(bySeq.last._4 <= 16L && bySeq.last._4 > 0L)
    }
  }

  test("zero-token documents are dropped; empty group vanishes") {
    val withEmpty = docs.union(Seq((900L, "sEmpty", "   ")).toDF("doc_id", "source", "text"))
    val placed = Packing.concatChunkPack(withEmpty, "doc_id", $"text", seqLen = 16L, Seq("source"))
    assert(placed.where($"source" === "sEmpty").isEmpty)
    assert(placed.where($"doc_id" === 900L).isEmpty)
  }

  test("global packing (no shard columns) is rejected") {
    intercept[IllegalArgumentException] {
      Packing.concatChunkPack(docs, "doc_id", $"text", 16L, Nil)
    }
  }

  test("property: placement equals a driver-side replay on random corpora") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val n = 30 + rnd.nextInt(60)
      val seqLen = 8L + rnd.nextInt(24)
      val data = (0 until n).map { i =>
        (i.toLong + trial * 1000, s"s${rnd.nextInt(3)}", ("w " * rnd.nextInt(12)).trim)
      }
      val df = data.toDF("doc_id", "source", "text")
      val got = Packing.concatChunkPack(df, "doc_id", $"text", seqLen, Seq("source"))
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      // driver replay: same priority order, cumulative offsets, div spans
      val expect = data
        .map { case (id, src, text) =>
          val nt = text.split(" ").count(_.nonEmpty).toLong // "w"-only corpus: words = tokens
          (src, id, nt)
        }
        .filter(_._3 > 0)
        .groupBy(_._1).toSeq.flatMap { case (src, ds) =>
          var cum = 0L
          ds.sortBy { case (_, id, _) =>
            val hex = java.security.MessageDigest.getInstance("MD5")
              .digest(id.toString.getBytes("UTF-8")).take(4)
              .map("%02x".format(_)).mkString
            (java.lang.Long.parseLong(hex, 16) / 4294967296.0, id)
          }.map { case (_, id, nt) =>
            val off = cum; cum += nt
            (src, id, nt, off, off / seqLen, (off + nt - 1) / seqLen)
          }
        }.toSet
      assert(got == expect, s"trial $trial (n=$n, seqLen=$seqLen)")
    }
  }
}
