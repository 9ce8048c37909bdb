package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming cluster-balanced admission — the streaming form of
  * `ops/Sampling.clusterBalancedSample`: embeddings arrive on an unbounded
  * stream, each is assigned its closed-form sign-LSH cell STATELESSLY
  * (the quantizer has no fitted state — the same property that makes the
  * batch operator hash-checkable makes the stream assignment a pure map),
  * and each cell admits at most `quota` members, forever. The
  * ingestion-time diversity cap a continuously-fed training mix needs:
  * once a mode of the embedding space has contributed its quota, further
  * arrivals from that mode are dropped at the door instead of in a
  * nightly batch re-sample.
  *
  * Scale shape: the cell id is the state key, so state shards like any
  * keyed aggregation and holds ONE long (the cell's admitted count) per
  * cell — at most 2^bitsPerCell longs TOTAL, regardless of stream volume.
  * This is the same bounded-forever state class as the Bloom admission
  * filter (`StreamingBloomDedup`), strictly smaller than the
  * text-dedup/near-dup stores (which grow with distinct content).
  *
  * Semantics are ARRIVAL-ORDER (a stream cannot re-order what has not
  * arrived yet); within one micro-batch rows fold in the batch operator's
  * (md5-unit, id) priority order, so replays admit the same set and a
  * single-batch feed reproduces the batch operator bit-for-bit
  * (StreamingClusterSampleSpec asserts both).
  */
object StreamingClusterSample {

  /** One incoming embedding. */
  final case class Vec(vecId: Long, embedding: Seq[Float])

  /** An incoming embedding with its (stateless) cell assignment. */
  final case class CellVec(cell: Int, vecId: Long)

  /** An admitted embedding: its cell and admission rank within the cell. */
  final case class Kept(vecId: Long, cell: Int, cellRank: Long)

  /** JVM twin of `Similarity.lshCells` (band 0 of the RHP plane family) —
    * identical md5-seeded planes, exact float→double widening, 6-dp-rounded
    * projections, so a vector's cell is the same in both engines.
    */
  private[graft] def cellOf(v: Array[Double], planes: Array[Array[Double]],
                            bitsPerCell: Int): Int =
    StreamingNearDup.signBuckets(v, planes, 1, bitsPerCell)(0).toInt

  final class CellQuotaProcessor(quota: Int) extends StatefulProcessor[Int, CellVec, Kept] {
    @transient private var admitted: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getValueState[Long]("admitted", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Int, rows: Iterator[CellVec],
        timerValues: TimerValues): Iterator[Kept] = {
      var n = Option(admitted.get()).getOrElse(0L)
      val out = Seq.newBuilder[Kept]
      // deterministic intra-batch fold in the batch operator's priority
      // order — replay-stable, and batch-feed ≡ batch operator
      rows.toSeq.sortBy(v => (StreamingPacking.hashUnit(v.vecId), v.vecId)).foreach { v =>
        if (n < quota) { n += 1; out += Kept(v.vecId, key, n) }
      }
      admitted.update(n)
      out.result().iterator
    }
  }

  /** Diversity-cap admission over an embedding stream: every cell admits
    * its first `quota` arrivals, forever (state = one long per cell).
    */
  def admitClusterBalanced(vecs: Dataset[Vec], dim: Int, bitsPerCell: Int,
                           quota: Int): Dataset[Kept] = {
    import vecs.sparkSession.implicits._
    val planes = Array.tabulate(bitsPerCell, dim)(graft.ops.Similarity.planeComponent)
    vecs.map(v => CellVec(cellOf(v.embedding.toArray.map(_.toDouble), planes, bitsPerCell), v.vecId))
      .groupByKey(_.cell)
      .transformWithState(new CellQuotaProcessor(quota), TimeMode.None(), OutputMode.Append())
  }
}
