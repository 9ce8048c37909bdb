package graft.streaming

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, Dataset}

/** Streaming semantic decontamination — the ingestion-time form of
  * `ops/Similarity.semanticContaminationReport`: every arriving embedding
  * is checked against a FROZEN benchmark index and rejected iff its exact
  * cosine to some LSH-candidate benchmark vector reaches the threshold.
  * The benchmark side is an eval suite — small and fixed by definition —
  * so the whole index (banded bucket map + raw vectors) is driver state a
  * scorer ships to its ingest fleet, exactly like the frozen DSIR ratio
  * table ([[StreamingDsir]]); the decision is a function of the arriving
  * row ALONE, so the filter is STATELESS and reproduces the batch flag
  * set bit for bit (StreamingSemanticDeconSpec).
  *
  * The JVM math mirrors the batch Columns number for number: the same
  * md5-seeded hyperplanes ([[Similarity.planeComponent]]), the same
  * index-order double dot product, the same 6-dp rounds at the sign test
  * and the cosine — so stream and batch agree not just on verdicts but on
  * every reported cosine.
  */
object StreamingSemanticDecon {

  /** One incoming embedding row. */
  final case class Vec(vecId: Long, embedding: Seq[Float])

  /** A contaminated arrival: the batch report's row, streamed. */
  final case class Flagged(vecId: Long, nBenchHits: Long, maxCosine: Double)

  /** Ceiling on the benchmark the frozen index may hold: the index lives
    * on every ingest worker (vectors + bucket map), and eval suites sit
    * far below this; corpus-scale "benchmarks" belong in the batch
    * broadcast-join form.
    */
  val MaxBenchmarkVectors: Int = 1 << 20

  /** The frozen benchmark index: per (band, bucket), the indices of
    * benchmark vectors hashing there, plus the raw vectors and norms for
    * exact verification.
    */
  final class FrozenBenchmark private[streaming] (
      private[streaming] val planes: Array[Array[Double]],
      private[streaming] val bands: Int,
      private[streaming] val bitsPerBand: Int,
      private[streaming] val buckets: Map[(Int, Long), Array[Int]],
      private[streaming] val ids: Array[Long],
      private[streaming] val vecs: Array[Array[Double]],
      private[streaming] val norms: Array[Double]) extends Serializable {
    def size: Int = ids.length
  }

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Index-order double dot — the JVM twin of the codegen'd `graft_dot`. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Band buckets of a vector under `planes` — the JVM twin of the batch
    * `signBucketArray`: bit j of band b is the 6-dp-rounded sign of the
    * projection onto plane b·bits+j.
    */
  private[streaming] def bandBuckets(v: Array[Double], planes: Array[Array[Double]],
                                     bands: Int, bitsPerBand: Int): Array[Long] =
    Array.tabulate(bands) { b =>
      var bkt = 0L
      var j = 0
      while (j < bitsPerBand) {
        if (round6(dot(v, planes(b * bitsPerBand + j))) >= 0) bkt |= (1L << j)
        j += 1
      }
      bkt
    }

  /** Driver-side freeze of a benchmark embedding table: collects the
    * (bounded) benchmark, computes its band buckets with the identical
    * plane math, and builds the (band, bucket) → vector-indices map the
    * per-row probe walks.
    */
  def freeze(benchmark: DataFrame, dim: Int,
             idCol: String = "vec_id", vecCol: String = "embedding",
             bands: Int = 16, bitsPerBand: Int = 8): FrozenBenchmark = {
    // Enforce the ceiling BEFORE collect(): a corpus-scale benchmark must
    // fail here cheaply, not OOM the driver on the collect the require
    // would have guarded.
    val overCap = benchmark.limit(MaxBenchmarkVectors + 1).count()
    require(overCap <= MaxBenchmarkVectors,
      s"benchmark (> $MaxBenchmarkVectors vectors) exceeds MaxBenchmarkVectors: " +
        "freeze eval-suite-sized sets only; decontaminate " +
        "corpus-scale sets with the batch broadcast join")
    val rows = benchmark.select(idCol, vecCol).collect()
    val ids = rows.map(_.getLong(0))
    val vecs = rows.map(_.getSeq[Float](1).toArray.map(_.toDouble))
    vecs.foreach(v => require(v.length == dim, s"benchmark vector of dim ${v.length}, expected $dim"))
    val planes = Array.tabulate(bands * bitsPerBand, dim)(Similarity.planeComponent)
    val norms = vecs.map(v => math.sqrt(dot(v, v)))
    val buckets = vecs.zipWithIndex
      .flatMap { case (v, i) =>
        bandBuckets(v, planes, bands, bitsPerBand).zipWithIndex.map { case (bkt, band) =>
          (band, bkt) -> i
        }
      }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    new FrozenBenchmark(planes, bands, bitsPerBand, buckets, ids, vecs, norms)
  }

  /** The per-row verdict — the JVM twin of the batch report row: LSH
    * candidates are benchmark vectors sharing at least one (band, bucket)
    * key; distinct candidates are verified with the exact 6-dp cosine;
    * None when nothing clears the threshold.
    */
  private[streaming] def flagOf(v: Array[Double], fb: FrozenBenchmark,
                                threshold: Double): Option[(Long, Double)] = {
    val mine = bandBuckets(v, fb.planes, fb.bands, fb.bitsPerBand)
    val cand = scala.collection.mutable.SortedSet.empty[Int]
    var band = 0
    while (band < fb.bands) {
      fb.buckets.get((band, mine(band))).foreach(_.foreach(cand.add))
      band += 1
    }
    if (cand.isEmpty) return None
    val vn = math.sqrt(dot(v, v))
    var hits = 0L
    var maxCos = Double.NegativeInfinity
    cand.foreach { i =>
      val c = round6(dot(v, fb.vecs(i)) / (vn * fb.norms(i)))
      if (c >= threshold) { hits += 1; if (c > maxCos) maxCos = c }
    }
    if (hits == 0L) None else Some((hits, maxCos))
  }

  /** Streamed contamination report: one [[Flagged]] row per contaminated
    * arrival — the batch report, incrementally. Stateless map, composes
    * with every other admission stage.
    */
  def flagContaminated(rows: Dataset[Vec], fb: FrozenBenchmark,
                       threshold: Double): Dataset[Flagged] = {
    import rows.sparkSession.implicits._
    rows.flatMap { r =>
      flagOf(r.embedding.toArray.map(_.toDouble), fb, threshold)
        .map { case (hits, maxCos) => Flagged(r.vecId, hits, maxCos) }
    }
  }

  /** Stateless admission filter: keep rows the report would NOT flag. */
  def admitClean(rows: Dataset[Vec], fb: FrozenBenchmark, threshold: Double): Dataset[Vec] =
    rows.filter(r => flagOf(r.embedding.toArray.map(_.toDouble), fb, threshold).isEmpty)
}
