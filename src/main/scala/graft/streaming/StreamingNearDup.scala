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

  /** JVM twin of `Dedup.md5Hash32` at off = 1 (first 8 md5 hex chars). */
  private[graft] def md5Hash32Jvm(s: String): Long =
    java.lang.Long.parseLong(StreamingCdc.md5Hex(s).substring(0, 8), 16)

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
              // round6 (HALF_UP), NOT math.rint (half-even): the batch
              // operator rounds with Spark's round(), and an est landing on
              // a .xxxxxx5 boundary (e.g. 65/128) would diverge
              out += CandidatePair(math.min(m.docId, e.docId), math.max(m.docId, e.docId),
                round6(est))
          }
          existing += e
          seen += e.docId
          members.appendValue(e)
        }
      }
      out.result().iterator
    }
  }

  /** One incoming embedding row (X2e streaming twin). */
  final case class Vec(vecId: Long, embedding: Array[Float])

  /** An embedding's presence in one sign-LSH band bucket: the widened
    * vector and its precomputed norm ride into state so verification inside
    * the bucket needs no lookup join (state holds bucket members only —
    * occupancy-bounded, like the text variant's signatures).
    */
  final case class VecBandEntry(bucket: String, vecId: Long, vec: Array[Double], vnorm: Double)

  /** An emitted verified pair, id_a < id_b, exact cosine rounded to 6 dp —
    * value-identical to the batch `randomHyperplaneNearDupPairs` output.
    */
  final case class VecPair(idA: Long, idB: Long, cosine: Double)

  /** JVM twin of Spark's `round(x, 6)` (BigDecimal HALF_UP on the decimal
    * rendering of the double) — keeps stream sign bits and cosines
    * bit-identical to the batch Column pipeline.
    */
  private[graft] def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** JVM twin of `graft_dot`: exact float→double widening, products summed
    * in index order.
    */
  private[graft] def dotJvm(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** JVM twin of the batch band-bucket computation in
    * [[graft.ops.Similarity.randomHyperplaneNearDupPairs]]: bit j of band b
    * set iff the 6-dp-rounded projection onto md5-seeded hyperplane
    * b·bits+j is >= 0. Planes come from the same
    * [[graft.ops.Similarity.planeComponent]] generator, so a vector's
    * bucket keys are identical in both engines.
    */
  private[graft] def signBuckets(v: Array[Double], planes: Array[Array[Double]],
                                 bands: Int, bitsPerBand: Int): Array[Long] =
    Array.tabulate(bands) { b =>
      var bkt = 0L
      var j = 0
      while (j < bitsPerBand) {
        if (round6(dotJvm(v, planes(b * bitsPerBand + j))) >= 0) bkt |= (1L << j)
        j += 1
      }
      bkt
    }

  /** Per-bucket membership state for the embedding variant: a new vector is
    * verified (exact cosine) against every stored member of the bucket and
    * pairs at or above the threshold are emitted immediately. Multi-band
    * hits emit once per shared band (buckets are independent keys);
    * consumers dedup by (id_a, id_b) exactly as with the text variant.
    */
  final class VecBucketProcessor(threshold: Double, ttlMs: Long)
      extends StatefulProcessor[String, VecBandEntry, VecPair] {
    @transient private var members: ListState[VecBandEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl = if (ttlMs > 0) new TTLConfig(java.time.Duration.ofMillis(ttlMs)) else TTLConfig.NONE
      members = getHandle.getListState[VecBandEntry]("members", Encoders.product[VecBandEntry], ttl)
    }

    override def handleInputRows(bucket: String, rows: Iterator[VecBandEntry],
        timerValues: TimerValues): Iterator[VecPair] = {
      val existing = collection.mutable.ArrayBuffer.empty[VecBandEntry] ++ members.get()
      val seen = collection.mutable.Set.empty[Long] ++ existing.iterator.map(_.vecId)
      val out = Seq.newBuilder[VecPair]
      rows.foreach { e =>
        if (!seen.contains(e.vecId)) {
          existing.foreach { m =>
            val cos = round6(dotJvm(m.vec, e.vec) / (m.vnorm * e.vnorm))
            if (cos >= threshold)
              out += VecPair(math.min(m.vecId, e.vecId), math.max(m.vecId, e.vecId), cos)
          }
          existing += e
          seen += e.vecId
          members.appendValue(e)
        }
      }
      out.result().iterator
    }
  }

  /** Verified near-dup pairs over an embedding stream — the streaming twin
    * of [[graft.ops.Similarity.randomHyperplaneNearDupPairs]] (same
    * md5-seeded hyperplanes, same 6-dp rounds, defaults 16 bands x 4 bits).
    * State shards by (band, sign-bucket) key and holds bucket members only;
    * TTL bounds it for rolling-window dedup.
    */
  def vecPairsStream(
      vecs: Dataset[Vec], threshold: Double, dim: Int,
      bands: Int = 16, bitsPerBand: Int = 4, ttlMs: Long = 0): Dataset[VecPair] = {
    import vecs.sparkSession.implicits._
    val planes = Array.tabulate(bands * bitsPerBand, dim)(graft.ops.Similarity.planeComponent)
    val timeMode = if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    vecs.flatMap { v =>
      val vd = v.embedding.map(_.toDouble) // exact widening, like graft_dot
      val n = math.sqrt(dotJvm(vd, vd))
      signBuckets(vd, planes, bands, bitsPerBand).zipWithIndex.map { case (bkt, b) =>
        VecBandEntry(s"$b:$bkt", v.vecId, vd, n)
      }.toSeq
    }.groupByKey(_.bucket)
      .transformWithState(new VecBucketProcessor(threshold, ttlMs),
        timeMode, OutputMode.Append())
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
