package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming sequence packing — the streaming form of
  * `ops/Packing.concatChunkPack`: documents arrive on an unbounded stream
  * and each SHARD (the group key) appends them to its packed token stream
  * at arrival, emitting the same placement contract as the batch operator
  * (start_offset, first_seq, last_seq). This is the ingestion-time path of
  * a continuously-growing training dataset: a document's placement is
  * assigned once, when it arrives, and never moves — downstream tensor
  * writers can materialize sequence files incrementally as shards fill.
  *
  * Scale shape: the shard key is the state key, so state shards like any
  * keyed aggregation and holds ONE long per shard (the shard stream's
  * current token length) — bytes per shard, regardless of stream volume.
  *
  * Ordering: the batch operator packs in (md5(id), id) priority order; a
  * stream cannot re-order what has not arrived, so placement is
  * ARRIVAL-ORDER across micro-batches, with a deterministic
  * (md5-unit(id), id) fold within each batch — replays of a batch place
  * identically, and a stream fed in the batch priority order reproduces
  * the batch placement bit-for-bit (StreamingPackingSpec asserts this).
  */
object StreamingPacking {

  /** One incoming document with its shard. */
  final case class Doc(shard: String, docId: Long, text: String)

  /** A placed document: [[graft.ops.Packing.concatChunkPack]]'s row. */
  final case class Placed(shard: String, docId: Long, nTokens: Long,
                          startOffset: Long, firstSeq: Long, lastSeq: Long)

  /** JVM twin of `Sampling.hashUnit` (Column form) — keep in sync: first 8
    * md5 hex chars of the id string over 2^32. Digest/hex via the one
    * shared [[StreamingCdc.md5Hex]] like the other streaming twins.
    */
  private[graft] def hashUnit(id: Long): Double =
    java.lang.Long.parseLong(StreamingCdc.md5Hex(id.toString).substring(0, 8), 16) / 4294967296.0

  final class PackProcessor(seqLen: Long) extends StatefulProcessor[String, Doc, Placed] {
    @transient private var streamLen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      streamLen = getHandle.getValueState[Long]("streamLen", Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Doc],
        timerValues: TimerValues): Iterator[Placed] = {
      var off = Option(streamLen.get()).getOrElse(0L)
      val out = Seq.newBuilder[Placed]
      // deterministic intra-batch fold in the batch operator's priority
      // order, so replay is stable and batch-order feeds match batch output
      rows.toSeq.sortBy(d => (hashUnit(d.docId), d.docId)).foreach { d =>
        val n = StreamingQuota.tokenCount(d.text)
        // zero-token docs occupy no positions and are dropped, like batch
        if (n > 0) {
          out += Placed(key, d.docId, n, off, off / seqLen, (off + n - 1) / seqLen)
          off += n
        }
      }
      streamLen.update(off)
      out.result().iterator
    }
  }

  /** Placement stream over arriving documents; each shard's packed stream
    * grows forever (state = one long/shard).
    */
  def placementStream(docs: Dataset[Doc], seqLen: Long): Dataset[Placed] = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    import docs.sparkSession.implicits._
    docs.groupByKey(_.shard)
      .transformWithState(new PackProcessor(seqLen), TimeMode.None(), OutputMode.Append())
  }
}
