package graft.streaming

import graft.ops.Dedup
import graft.streaming.StreamingAdmission.Doc
import org.apache.spark.sql.Dataset

/** Streaming DSIR admission — the ingestion-time form of
  * `ops/Dsir.score`: every arriving document is scored against a FROZEN
  * ratio model and admitted iff its mean log-likelihood ratio clears the
  * floor. Unlike mixture reweighting (whose acceptance fractions are
  * functions of the final group counts — not append-monotone, see
  * IMPLEMENTATION.md "Streaming posture"), DSIR scoring against a fixed
  * model is a function of the document ALONE, so the filter is STATELESS
  * and exactly reproduces the batch decision: a doc admitted here is a
  * doc `Dsir.score(...).where(dsir_score >= floor)` keeps, bit for bit
  * (asserted by StreamingDsirSpec). Model refreshes are batch refits —
  * the standard posture: the ratio table is corpus-global, so the
  * streaming layer consumes snapshots, exactly like the SemDeDup
  * centroids.
  *
  * The JVM scoring math mirrors the batch Columns number for number:
  * same normalization, same unigram+bigram grams, same 60-bit md5 bucket
  * hash, and the same exact-DECIMAL(18,6) addend mean with a final 6-dp
  * round.
  */
object StreamingDsir {

  /** Driver-side freeze of a fitted ratio table ([[graft.ops.Dsir.fitLogRatios]]):
    * bounded by construction — exactly `buckets` rows (thousands), the
    * model a production scorer ships to its ingest fleet.
    */
  def freezeRatios(ratios: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    ratios.select("bucket", "log_ratio")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** JVM twin of the batch per-doc score (mean bucket log-ratio through
    * exact DECIMAL(18,6) addends). Returns None for gramless documents —
    * the batch operator drops them (no evidence, no score).
    */
  private[graft] def score(text: String, ratios: Map[Long, Double], buckets: Int): Option[Double] = {
    val words = StreamingDedup.normalize(text).split(" ").filter(_.nonEmpty)
    val grams = words.iterator ++ words.iterator.sliding(2).withPartial(false).map(_.mkString(" "))
    var sum = java.math.BigDecimal.ZERO
    var n = 0L
    grams.foreach { g =>
      val b = StreamingNearDup.md5Hash60Jvm(g) % buckets
      // every bucket has a ratio (dense spine) — .apply, not .get:
      // a miss here is a frozen-model/bucket-count mismatch, fail loudly
      val r = ratios(b)
      sum = sum.add(java.math.BigDecimal.valueOf(r).setScale(6, java.math.RoundingMode.HALF_UP))
      n += 1
    }
    if (n == 0L) None else Some(round6(sum.doubleValue() / n))
  }

  /** Stateless admission filter: keep documents whose frozen-model DSIR
    * score clears `minScore`. Works identically on a stream or a batch
    * Dataset; composes with the other admission stages (quality,
    * decontamination, quota) as a plain filter.
    */
  def admitByScore(docs: Dataset[Doc], ratios: Map[Long, Double], buckets: Int,
                   minScore: Double): Dataset[Doc] =
    docs.filter(d => score(d.text, ratios, buckets).exists(_ >= minScore))
}
