package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import org.apache.spark.sql.streaming.ValueState

/** Streaming approximate dedup behind a sharded Bloom filter — the
  * bounded-STATE alternative to [[StreamingDedup]]: exact first-seen
  * dedup keeps one state entry per distinct content, which at 100 TB of
  * mostly-unique corpus is a state store the size of the corpus' key set;
  * the Bloom admission filter caps state at `shards × mBits/8` bytes
  * FOREVER, trading a configurable false-positive rate (unique docs
  * wrongly dropped, ~(1-e^(-kn/m))^k) for it. The trade is one-sided by
  * construction: a true duplicate is NEVER admitted twice (its bits were
  * all set by the copy that was admitted), so the guarantee that matters
  * for training-data hygiene — no duplicate passes — is exact; only
  * recall of uniques degrades, and gracefully, as the filter fills.
  *
  * Sharding: the content-hash keyspace is split into `shards` groups by
  * the md5 tail byte, one Bloom bit-array of `mBits` per shard, so (a)
  * state shards across executors like any keyed state, (b) `shards` is
  * the parallelism knob — size it to the cluster, and (c) per-shard
  * occupancy n/shards drives the FP rate, so total capacity scales
  * linearly in `shards` at constant FP.
  *
  * Determinism (spec-tested): bit positions come from double hashing over
  * two 60-bit md5 slices of the content key (h1 + i·h2 mod mBits, h2
  * forced odd), so admission is a pure function of feed order — the JVM
  * reference twin in the spec replays it bit for bit. Within one
  * micro-batch, a shard's rows are processed in ascending docId order
  * (the batch family's keep-min tiebreak).
  */
object StreamingBloomDedup {

  /** One incoming document (same shape as [[StreamingDedup.Doc]]). */
  final case class Doc(docId: Long, text: String)

  /** An admitted (believed-first-seen) document. */
  final case class Admitted(docId: Long, keyMd5: String, shard: Int)

  /** Content key: md5 of the batch-identical normalization. */
  private[graft] def contentKey(text: String): String =
    StreamingCdc.md5Hex(StreamingDedup.normalize(text))

  /** Shard = last md5 byte mod `shards` — independent of the bit-position
    * slices (chars 0-29), so shard routing never correlates with bit
    * placement inside the filter. One byte carries only 256 values, so
    * `shards` is capped at 256 (enforced in [[dedupBloom]]): a larger
    * setting would silently leave shards-256 shards empty, capping
    * capacity below the configured `shards × mBits/8` bound. Scale
    * capacity past 256 shards by raising `mBits`, which the bound scales
    * with directly.
    */
  private[graft] def shardOf(keyMd5: String, shards: Int): Int =
    Integer.parseInt(keyMd5.substring(30, 32), 16) % shards

  /** The k probe positions for a key: classic double hashing (Kirsch &
    * Mitzenmacher 2006 — two independent hashes generate k with no loss
    * of FP asymptotics). h2 is forced odd so for power-of-two `mBits` the
    * probe sequence never degenerates to a single position.
    */
  private[graft] def bitPositions(keyMd5: String, mBits: Int, k: Int): Array[Int] = {
    val h1 = java.lang.Long.parseLong(keyMd5.substring(0, 15), 16)
    val h2 = java.lang.Long.parseLong(keyMd5.substring(15, 30), 16) | 1L
    Array.tabulate(k) { i =>
      val p = (h1 + i.toLong * h2) % mBits
      (if (p < 0) p + mBits else p).toInt
    }
  }

  final class BloomProcessor(mBits: Int, k: Int)
      extends StatefulProcessor[Int, Doc, Admitted] {
    @transient private var bits: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      bits = getHandle.getValueState[Array[Byte]]("bloom", Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(shard: Int, rows: Iterator[Doc],
        timerValues: TimerValues): Iterator[Admitted] = {
      val arr = Option(bits.get()).getOrElse(new Array[Byte]((mBits + 7) / 8))
      val out = scala.collection.mutable.ArrayBuffer.empty[Admitted]
      // ascending docId inside the batch: the keep-min tiebreak of the
      // batch dedup family, and what makes replay deterministic
      rows.toArray.sortBy(_.docId).foreach { d =>
        val key = contentKey(d.text)
        val pos = bitPositions(key, mBits, k)
        val dup = pos.forall(p => (arr(p >> 3) & (1 << (p & 7))) != 0)
        if (!dup) {
          pos.foreach(p => arr(p >> 3) = (arr(p >> 3) | (1 << (p & 7))).toByte)
          out += Admitted(d.docId, key, shard)
        }
      }
      bits.update(arr) // one state write per shard per batch, not per row
      out.iterator
    }
  }

  /** Bloom-guarded first-seen admission. State is permanently bounded at
    * `shards × ⌈mBits/8⌉` bytes; duplicates never pass; uniques pass with
    * probability ≥ 1-(1-e^(-kn_shard/mBits))^k.
    */
  def admitFirstSeen(docs: Dataset[Doc], mBits: Int = 1 << 22, k: Int = 5,
                     shards: Int = 64): Dataset[Admitted] = {
    require(mBits >= 8 && k >= 1 && shards >= 1 && shards <= 256,
      s"need mBits >= 8, k >= 1, 1 <= shards <= 256 (shard routing uses one " +
        s"md5 byte): mBits=$mBits k=$k shards=$shards")
    import docs.sparkSession.implicits._
    docs.groupByKey(d => shardOf(contentKey(d.text), shards))
      .transformWithState(new BloomProcessor(mBits, k), TimeMode.None(), OutputMode.Append())
  }

  /** Driver-side reference twin: replay `batches` in feed order through
    * the identical admission fold (per-shard arrays, in-batch docId sort)
    * — what the spec compares the streaming output against, and a
    * planning tool for sizing mBits/k against a sample.
    */
  private[graft] def referenceAdmit(batches: Seq[Seq[Doc]], mBits: Int, k: Int,
                                    shards: Int): Seq[Admitted] = {
    val filters = Array.fill(shards)(new Array[Byte]((mBits + 7) / 8))
    val out = scala.collection.mutable.ArrayBuffer.empty[Admitted]
    batches.foreach { batch =>
      batch.groupBy(d => shardOf(contentKey(d.text), shards)).toSeq.sortBy(_._1)
        .foreach { case (shard, docs) =>
          val arr = filters(shard)
          docs.sortBy(_.docId).foreach { d =>
            val key = contentKey(d.text)
            val pos = bitPositions(key, mBits, k)
            val dup = pos.forall(p => (arr(p >> 3) & (1 << (p & 7))) != 0)
            if (!dup) {
              pos.foreach(p => arr(p >> 3) = (arr(p >> 3) | (1 << (p & 7))).toByte)
              out += Admitted(d.docId, key, shard)
            }
          }
        }
    }
    out.toSeq
  }
}
