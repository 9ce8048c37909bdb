package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Domain-level trust filtering (SURVEY.md §2.12 X5 family): aggregate a
  * per-document quality signal to its source domain and drop every document
  * from the least-trustworthy domains — the corpus-curation analog of the
  * reference's type-selection gate (`/root/reference/app.js:20-27` decides
  * which entity TYPES flow; at corpus scale the unit of admission is the
  * source domain). This is the standard domain-blocklist / domain-score
  * stage of public pretraining pipelines (RefinedWeb's URL/domain filtering,
  * CCNet's per-domain buckets): individual documents from a content-farm
  * domain can look fine, the DOMAIN's aggregate quality is the tell.
  *
  * Scale posture: one linear scan computes per-doc quality with the domain
  * column riding along ([[TextAnalysis.stagedCounts]] `carry`), then ONE
  * hash aggregation keyed by domain (map-side combined — the shuffle carries
  * |domains| rows of three numbers, not documents). Domains are thousands-
  * to-millions at web scale while documents are billions, so the aggregate
  * output is broadcast-joined back; corpus text never shuffles. The trust
  * ranking is a window over the aggregated DOMAIN table only (bounded by
  * |domains|, never corpus-sized).
  *
  * Determinism: the per-domain mean goes through an exact DECIMAL sum of
  * the already-6dp-rounded per-doc scores (order-free), divided once and
  * re-rounded to 6 dp; the untrusted set is picked by rank with a full
  * (mean, domain) tiebreak — bit-reproducible in any md5-capable engine.
  */
object Domains {

  /** Per-domain quality report: document count, exact-decimal mean of the
    * blended per-doc quality score (rounded 6 dp), and a `trusted` verdict
    * — false for the `untrustedK` lowest-mean domains (ties broken by
    * domain name ascending, so the cut is total and reproducible).
    *
    * Output: (domainCol, n_docs, mean_quality, trusted), one row per
    * domain.
    */
  def domainStats(df: DataFrame, idCol: String, domainCol: String, text: Column,
                  untrustedK: Int = 4): DataFrame = {
    val staged = TextAnalysis.stagedCounts(df, idCol, text, carry = Seq(domainCol))
    domainTrustFromQuality(
      staged.select(col(domainCol), TextAnalysis.blendedScoreCol.as("__q")),
      domainCol, untrustedK)
  }

  /** [[domainStats]] over an ALREADY-SCORED (domainCol, __q) projection —
    * the split that lets a caller who has computed the per-doc blended
    * quality for its own purposes (e.g. [[Classify.logregFeatures]], whose
    * x2 IS the blended score) derive the trust verdicts from that same
    * scan instead of paying a second corpus pass (r16). One definition of
    * the aggregate/rank, so the two routes cannot drift.
    */
  private[ops] def domainTrustFromQuality(perDoc: DataFrame, domainCol: String,
                                          untrustedK: Int): DataFrame = {
    val perDomain = perDoc
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        // scores are 6dp-rounded doubles in [0,1]: DECIMAL(18,6) holds the
        // sum exactly for up to ~1e12 docs per domain, and the sum is
        // order-free so the mean is bit-identical across partitionings
        sum(col("__q").cast(DecimalType(18, 6))).as("__sum"))
      .select(col(domainCol), col("n_docs"),
        round(col("__sum").cast("double") / col("n_docs"), 6).as("mean_quality"))
    // rank over the DOMAIN table (|domains| rows — the window is bounded by
    // domain cardinality, which is what makes an unpartitioned window safe
    // here, exactly like mixtureSample's group-count window)
    val ranked = perDomain.withColumn("__r",
      row_number().over(Window.orderBy(col("mean_quality").asc, col(domainCol).asc)))
    ranked.select(col(domainCol), col("n_docs"),
      col("mean_quality"), (col("__r") > untrustedK).as("trusted"))
  }

  /** The corpus minus every document whose domain [[domainStats]] marks
    * untrusted. The trusted-domain set is tiny (it IS the domain table) —
    * broadcast semi-join, so the corpus side never shuffles.
    */
  def filterByDomainTrust(df: DataFrame, idCol: String, domainCol: String,
                          text: Column, untrustedK: Int = 4): DataFrame = {
    val trusted = domainStats(df, idCol, domainCol, text, untrustedK)
      .where(col("trusted")).select(col(domainCol))
    df.join(broadcast(trusted), Seq(domainCol), "left_semi")
  }
}
