package graft

import graft.ops.Sampling
import graft.streaming.StreamingClusterSample
import graft.streaming.StreamingClusterSample.{Kept, Vec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Streaming cluster-balanced admission: per-cell caps hold forever across
  * micro-batches, cell assignment twins the batch quantizer, and a
  * single-batch priority feed reproduces the batch operator bit-for-bit.
  */
class StreamingClusterSampleSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8
  private val Bits = 3

  private def vec(i: Long): Vec =
    Vec(i, Seq.tabulate(Dim)(d => if (d == (i % 4).toInt) 1.0f else 0.01f * ((i + d) % 3)))

  private def run(batches: Seq[Seq[Vec]], quota: Int): Seq[Kept] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Vec]
    val name = s"cluster_out_${System.nanoTime()}"
    val q = StreamingClusterSample.admitClusterBalanced(input.toDS(), Dim, Bits, quota)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("cs-ckpt").toString)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[Kept].collect().toSeq
  }

  test("cell assignment is the JVM twin of the batch lshCells quantizer") {
    val vecs = (0L until 24L).map(vec)
    val batch = graft.ops.Similarity.lshCells(vecs.toDF("vec_id", "embedding"), Dim, Bits)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val planes = Array.tabulate(Bits, Dim)(graft.ops.Similarity.planeComponent)
    vecs.foreach { v =>
      val jvm = StreamingClusterSample.cellOf(
        v.embedding.toArray.map(_.toDouble), planes, Bits)
      assert(jvm == batch(v.vecId), s"vec ${v.vecId}: stream cell $jvm != batch ${batch(v.vecId)}")
    }
  }

  test("per-cell quota holds across micro-batches; state carries over; ranks are cumulative") {
    val all = (0L until 30L).map(vec)
    val out = run(all.grouped(7).map(_.toSeq).toSeq, quota = 2)
    val byCell = out.groupBy(_.cell)
    byCell.foreach { case (c, rows) =>
      assert(rows.length <= 2, s"cell $c admitted ${rows.length} > quota")
      assert(rows.map(_.cellRank).sorted == (1L to rows.length).toSeq,
        s"cell $c ranks not cumulative across batches")
    }
    // a later arrival into a full cell must have been dropped: total
    // admitted is exactly min(quota, occupancy) summed over cells
    val occupancy = all.groupBy(v => {
      val planes = Array.tabulate(Bits, Dim)(graft.ops.Similarity.planeComponent)
      StreamingClusterSample.cellOf(v.embedding.toArray.map(_.toDouble), planes, Bits)
    }).view.mapValues(_.size).toMap
    assert(out.size == occupancy.values.map(math.min(_, 2)).sum)
  }

  test("single-batch feed reproduces the batch operator bit-for-bit") {
    val vecs = (0L until 40L).map(vec)
    val stream = run(Seq(vecs), quota = 3)
      .map(k => (k.vecId, k.cell, k.cellRank)).sortBy(_._1)
    val batch = Sampling.clusterBalancedSample(
        vecs.toDF("vec_id", "embedding"), Dim, Bits, quota = 3)
      .select("vec_id", "cell", "cell_rank").as[(Long, Int, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(stream == batch, "stream admission diverges from the batch sample")
  }
}
