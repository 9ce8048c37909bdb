package graft

import graft.ops.Sketches
import graft.streaming.StreamingSketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The streaming sketch store's claim: the maintained per-group sketch
  * after the stream drains EQUALS the batch sketch over the same rows
  * (order/batching-insensitive merges), estimates are monotone across
  * arrival waves, and the union read path gives the batch one-shot
  * answer.
  */
object StreamingSketchesSpec {
  case class SkEv(g: Long, k: String)
  case class QEv(g: Long, v: Double)
}

class StreamingSketchesSpec extends SparkSpec {
  import spark.implicits._
  import StreamingSketchesSpec.SkEv

  private def fixture: Seq[SkEv] =
    (0 until 60000).map(i => SkEv(i % 4, s"user_${i % 20000}"))

  test("streaming HLL store == batch store; estimates monotone across waves") {
    val rows = fixture
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SkEv]
    val q = StreamingSketches.distinctSketches(input.toDF(), col("g"), col("k"))
      .select(col("group"), hll_sketch_estimate(col("sketch")).as("est"),
        col("n_rows"))
      .writeStream.format("memory").queryName("hll_out")
      .option("checkpointLocation", Files.createTempDirectory("hll-ckpt").toString)
      .outputMode("complete").start()
    var last = Map.empty[Long, Long]
    rows.grouped(17000).foreach { b =>
      input.addData(b.toSeq: _*); q.processAllAvailable()
      val now = spark.table("hll_out").select("group", "est")
        .as[(Long, Long)].collect().toMap
      last.foreach { case (g, e) =>
        assert(now(g) >= e, s"estimate for group $g shrank: ${now(g)} < $e")
      }
      last = now
    }
    q.stop()
    val streamed = spark.table("hll_out")
      .select("group", "est", "n_rows").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val batch = Sketches.hllGroupSketches(rows.toDF("g", "k"), col("g"), col("k"))
      .select(col("group"), hll_sketch_estimate(col("sketch")).as("est"),
        col("n_rows")).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    // the union read path over the live store answers the one-shot question
    val unionEst = Sketches.hllUnionEstimate(
      Sketches.hllGroupSketches(rows.toDF("g", "k"), col("g"), col("k")))
      .select(col("distinct_approx")).as[Long].head()
    val oneShot = rows.toDF("g", "k")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("k"), lit(12)))).as[Long].head()
    assert(unionEst == oneShot)
  }

  test("streaming quantile store honors the rank bound at every wave; state stays bounded") {
    import StreamingSketchesSpec.QEv
    // pseudo-shuffled values so arrival order is adversarial for GK
    val rows = (0 until 60000).map(i => QEv(i % 4, ((i * 2654435761L) % 100003L).toDouble))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[QEv]
    val q = StreamingSketches.quantileSketches(input.toDF(), col("g"), col("v"),
        relativeError = 0.01)
      .writeStream.format("memory").queryName("qs_out")
      .option("checkpointLocation", Files.createTempDirectory("qs-ckpt").toString)
      .outputMode("complete").start()
    var seen = Map.empty[Long, Vector[Double]].withDefaultValue(Vector.empty)
    var maxBytes = 0
    rows.grouped(17000).foreach { b =>
      input.addData(b.toSeq: _*); q.processAllAvailable()
      b.foreach(e => seen += e.g -> (seen(e.g) :+ e.v))
      val now = spark.table("qs_out").select("group", "sketch", "n_rows")
        .as[(Long, Array[Byte], Long)].collect()
      assert(now.map(_._1).toSet == seen.keySet)
      now.foreach { case (g, bytes, n) =>
        assert(n == seen(g).size)
        maxBytes = math.max(maxBytes, bytes.length)
        val sorted = seen(g).sorted
        val sk = graft.functions.QuantileCodec.fromBytes(bytes)
        Seq(0.5, 0.9).foreach { p =>
          val est = sk.query(p).get
          val rank = sorted.count(_ <= est).toDouble / n
          assert(math.abs(rank - p) <= 0.02,
            s"group $g wave-n=$n p=$p estimate $est at rank $rank")
        }
      }
    }
    q.stop()
    // GK bound: ~(1/2e)·log2(2e·n) samples ≈ 10 KB at e=0.01, n=15k —
    // far under the 120 KB the raw per-group values would occupy
    assert(maxBytes > 0 && maxBytes < 30000, s"sketch state $maxBytes bytes")
  }

  test("streaming CMS store state is byte-identical to the batch store") {
    val rows = fixture
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SkEv]
    val q = StreamingSketches.frequencySketches(input.toDF(), col("g"), col("k"))
      .writeStream.format("memory").queryName("cms_out")
      .option("checkpointLocation", Files.createTempDirectory("cms-ckpt").toString)
      .outputMode("complete").start()
    rows.grouped(23000).foreach { b => input.addData(b.toSeq: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("cms_out")
      .select("group", "sketch").as[(Long, Array[Byte])].collect()
      .map(r => r._1 -> r._2).toMap
    val batch = Sketches.cmsGroupSketches(rows.toDF("g", "k"), col("g"), col("k"))
      .select("group", "sketch").as[(Long, Array[Byte])].collect()
      .map(r => r._1 -> r._2).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (g, bytes) =>
      assert(java.util.Arrays.equals(bytes, batch(g)),
        s"CMS state for group $g differs from the batch sketch")
    }
  }
}
