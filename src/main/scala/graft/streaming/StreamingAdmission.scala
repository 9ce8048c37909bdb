package graft.streaming

import graft.ops.TextAnalysis
import org.apache.spark.sql.Dataset

/** Streaming quality admission — the ingestion-time form of
  * `ops/TextAnalysis.gopherRules`: every arriving document is judged by
  * the same per-rule verdicts (word-count bounds, mean word length,
  * alphabetic floor, stopword floor, top-word / duplicate-2-gram
  * ceilings) the batch filter applies, the moment it arrives. Every rule
  * is a function of the document ALONE, so the filter is STATELESS — no
  * aggregation, no watermark, no state store; it composes with the other
  * streaming admission stages (decontamination, token quota) as a plain
  * filter on the stream.
  *
  * The JVM rule math mirrors the batch Column expressions number for
  * number (same normalization, same 6-dp HALF_UP rounding before each
  * threshold comparison), so a document admitted here is exactly a
  * document `gopherRules(...).where(keep)` keeps — asserted by
  * StreamingAdmissionSpec over the corpus fixture.
  */
object StreamingAdmission {

  /** One incoming document. */
  final case class Doc(docId: Long, text: String)

  /** The thresholds of [[TextAnalysis.gopherRules]], same defaults. */
  final case class QualityRules(
      minWords: Long = 30, maxWords: Long = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minAlphaRatio: Double = 0.6, minStopwords: Long = 1,
      maxTopWordFrac: Double = 0.3, maxDup2gramFrac: Double = 0.3)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val stopwords: Set[String] = TextAnalysis.Stopwords.flatMap(_._2).toSet

  /** JVM twin of the batch verdict conjunction — keep in sync with
    * `TextAnalysis.gopherRules` (the spec pins the equivalence).
    */
  private[graft] def keep(text: String, r: QualityRules): Boolean = {
    val norm = StreamingDedup.normalize(text)
    val words = norm.split(" ").filter(_.nonEmpty)
    val nw = words.length.toLong
    if (nw < r.minWords || nw > r.maxWords) return false
    // code points, not UTF-16 units: batch __sumlen sums Spark length(w)
    // (code points), so a supplementary-plane char must weigh 1 here too
    val meanLen = round6(words.map(w => w.codePointCount(0, w.length).toLong).sum.toDouble /
      math.max(nw, 1L))
    if (meanLen < r.minMeanLen || meanLen > r.maxMeanLen) return false
    // code points, not UTF-16 units: Spark's length() counts code points,
    // so a supplementary-plane char must weigh 1 in the denominator here too
    val alpha = round6(norm.count(c => c >= 'a' && c <= 'z').toDouble /
      math.max(norm.codePointCount(0, norm.length), 1))
    if (alpha < r.minAlphaRatio) return false
    if (words.count(stopwords) < r.minStopwords) return false
    // repetition rules: per-document facts, computable per row
    val counts = words.groupBy(identity).map(_._2.length.toLong)
    val topFrac = round6(counts.max.toDouble / nw)
    if (topFrac > r.maxTopWordFrac) return false
    val dupFrac =
      if (nw <= 1) 0.0
      else round6(1.0 - words.sliding(2).map(_.mkString(" ")).toSet.size.toDouble / (nw - 1))
    dupFrac <= r.maxDup2gramFrac
  }

  /** Stateless admission filter: keep documents that pass every quality
    * rule. Works identically on a stream or a batch Dataset.
    */
  def admitQuality(docs: Dataset[Doc], rules: QualityRules = QualityRules()): Dataset[Doc] =
    docs.filter(d => keep(d.text, rules))

  /** JVM twin of the batch blended quality score
    * (`TextAnalysis.qualityMetrics` → `quality_score`, round6) — keep in
    * sync with `blendedScore` (StreamingAdmissionSpec pins the
    * equivalence value-for-value over the fixture corpus). A null text
    * scores NaN, so every threshold comparison rejects it — exactly as the
    * batch null-propagating comparison does.
    */
  private[graft] def qualityScore(text: String): Double = {
    if (text == null) return Double.NaN
    val norm = StreamingDedup.normalize(text)
    val words = norm.split(" ").filter(_.nonEmpty)
    val nw = words.length.toLong
    val lengthScore = math.min(nw.toDouble / 50.0, 1.0)
    // code points, not UTF-16 units — batch length() counts code points
    val meanLen = words.map(w => w.codePointCount(0, w.length).toLong).sum.toDouble /
      math.max(nw, 1L)
    val wordLenScore = if (meanLen >= 3.0 && meanLen <= 10.0) 1.0 else 0.5
    val stopScore =
      math.min(words.count(stopwords).toDouble / math.max(nw, 1L) * 5, 1.0)
    round6((lengthScore + wordLenScore + stopScore) / 3.0)
  }

  /** Stateless CALIBRATED admission: keep documents whose blended quality
    * score clears a FROZEN threshold — the streaming half of the
    * threshold-sweep calibration (`TextAnalysis.thresholdSweep`, the
    * x8_curation_v10 gate). The sweep itself is corpus-global by
    * definition (fractions of final totals), so it runs batch-side over
    * the frozen corpus; the chosen floor ships to the ingest fleet as ONE
    * double and each arrival is judged alone — no state store, composes
    * with the quality/decontamination/quota admission stages.
    */
  def admitCalibrated(docs: Dataset[Doc], threshold: Double): Dataset[Doc] =
    docs.filter(d => qualityScore(d.text) >= threshold)
}
