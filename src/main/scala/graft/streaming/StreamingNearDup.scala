package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming MinHash-LSH near-duplicate admission — X2
  * (`ops/Dedup.minhashNearDupPairs`) over an unbounded document stream:
  * each arriving document is compared ONLY against prior documents sharing
  * an LSH band bucket, and candidate pairs at or above the estimated-
  * Jaccard threshold are emitted as they are discovered.
  *
  * Scale shape: the stream fans out to `bands` rows per document keyed by
  * (band, band-slice) — the streaming transliteration of the batch band
  * self-join — so state shards by bucket like any keyed aggregation and a
  * bucket holds only its members' (id, signature) entries (~8·numPerm
  * bytes each), never text. TTL bounds state for rolling-window dedup.
  * The all-pairs comparison the batch operator avoids via the band join is
  * avoided here by the same banding: a new document touches exactly
  * `bands` buckets regardless of corpus size.
  *
  * Signature math is the JVM twin of the batch operator (md5-based 60-bit
  * base hash, affine permutations mod 2^31-1 — [[Dedup.minhashPerm]]), so
  * a document's signature is identical in both engines; the spec asserts
  * stream ≡ batch on a shared fixture.
  *
  * Output is a candidate multiset: a pair agreeing on k bands is emitted
  * once per shared band (buckets are independent keys and cannot
  * coordinate). Consumers dedup by (id_a, id_b) — the streaming analog of
  * the `.distinct()` inside [[Dedup.lshCandidatePairs]] — e.g. with
  * [[StreamingDedup]]-style keyed state or a per-micro-batch
  * `dropDuplicates` in `foreachBatch`.
  */
object StreamingNearDup {

  /** One incoming document. */
  final case class Doc(docId: Long, text: String)

  /** A document's presence in one band bucket (internal fan-out row). */
  final case class BandEntry(bucket: String, docId: Long, sig: Array[Long])

  /** An emitted candidate pair, id_a < id_b, with the estimated Jaccard
    * (fraction of agreeing signature components).
    */
  final case class CandidatePair(idA: Long, idB: Long, estJaccard: Double)

  /** JVM twin of `Dedup.md5Hash60` (first 15 md5 hex chars as a long). */
  private[graft] def md5Hash60Jvm(s: String): Long =
    java.lang.Long.parseLong(StreamingCdc.md5Hex(s).substring(0, 15), 16)

  /** JVM twin of the batch signature pipeline: normalize → word shingles
    * (distinct, whole-text fallback below `shingleLen` words) → md5 base
    * hash mod p → per-permutation affine min. Keep in sync with
    * `Dedup.explodedShingles` / `minhashSignaturesExploded`.
    */
  private[graft] def signature(text: String, numPerm: Int, shingleLen: Int): Array[Long] = {
    val words = StreamingDedup.normalize(text).split(" ").filter(_.nonEmpty)
    val shingles =
      if (words.length >= shingleLen)
        (0 to words.length - shingleLen).map(i => words.slice(i, i + shingleLen).mkString(" ")).distinct
      else Seq(words.mkString(" "))
    val xs = shingles.map(s => md5Hash60Jvm(s) % Dedup.MinhashP)
    Array.tabulate(numPerm) { i =>
      val (a, b) = Dedup.minhashPerm(i)
      xs.map(x => (a * x + b) % Dedup.MinhashP).min
    }
  }

  /** Per-bucket membership state; new arrivals pair against every stored
    * member (bucket occupancy, not corpus size) and are then stored
    * themselves. Re-keyed duplicates of one docId in the same bucket
    * (re-sends) are ignored — first arrival represents the document.
    */
  final class BucketProcessor(threshold: Double, numPerm: Int, ttlMs: Long)
      extends StatefulProcessor[String, BandEntry, CandidatePair] {
    @transient private var members: ListState[BandEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl = if (ttlMs > 0) new TTLConfig(java.time.Duration.ofMillis(ttlMs)) else TTLConfig.NONE
      members = getHandle.getListState[BandEntry]("members", Encoders.product[BandEntry], ttl)
    }

    override def handleInputRows(bucket: String, rows: Iterator[BandEntry],
        timerValues: TimerValues): Iterator[CandidatePair] = {
      val existing = collection.mutable.ArrayBuffer.empty[BandEntry] ++ members.get()
      val seen = collection.mutable.Set.empty[Long] ++ existing.iterator.map(_.docId)
      val out = Seq.newBuilder[CandidatePair]
      rows.foreach { e =>
        if (!seen.contains(e.docId)) {
          existing.foreach { m =>
            var agree = 0
            var i = 0
            while (i < numPerm) { if (m.sig(i) == e.sig(i)) agree += 1; i += 1 }
            val est = agree.toDouble / numPerm
            if (est >= threshold)
              out += CandidatePair(math.min(m.docId, e.docId), math.max(m.docId, e.docId),
                math.rint(est * 1e6) / 1e6)
          }
          existing += e
          seen += e.docId
          members.appendValue(e)
        }
      }
      out.result().iterator
    }
  }

  /** Candidate near-dup pairs over a document stream. Defaults mirror the
    * batch operator (64 permutations, 16 bands of 4, threshold 0.5).
    */
  def candidatePairsStream(
      docs: Dataset[Doc], threshold: Double = 0.5, shingleLen: Int = 3,
      numPerm: Int = 64, bands: Int = 16, ttlMs: Long = 0): Dataset[CandidatePair] = {
    require(numPerm % bands == 0, s"numPerm ($numPerm) must divide into bands ($bands)")
    import docs.sparkSession.implicits._
    val rowsPerBand = numPerm / bands
    val timeMode = if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    docs.flatMap { d =>
      val sig = signature(d.text, numPerm, shingleLen)
      (0 until bands).map { b =>
        val slice = sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
        BandEntry(s"$b:${slice.mkString(",")}", d.docId, sig)
      }
    }.groupByKey(_.bucket)
      .transformWithState(new BucketProcessor(threshold, numPerm, ttlMs),
        timeMode, OutputMode.Append())
  }
}
