package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR — Data Selection with Importance Resampling (Xie et al.,
  * arXiv:2302.03169): score every raw-corpus document by how much more
  * likely its hashed n-gram features are under a TARGET domain than under
  * the raw corpus itself, then keep the top of the ranking. This is the
  * standard "make 100 TB of web text look like my target domain" selection
  * pass; the reference pipeline's analogous decision is type selection
  * (`/root/reference/app.js:20-27`) — which entities flow downstream — and
  * DSIR is that decision made statistically at corpus scale.
  *
  * Feature model (the paper's hashed n-gram generative model): word
  * unigrams and bigrams hash into `buckets` buckets via the portable
  * 60-bit md5 hash; each corpus induces a smoothed categorical
  * distribution over buckets; a document's importance weight is the mean
  * per-occurrence log-likelihood ratio. All boundary values round to 6 dp
  * and per-gram addends sum through exact DECIMAL(18,6) (the x5_lm_score
  * discipline), so scores, ranks and the selected set are bit-identical
  * in any engine — the DuckDB twin replays fit and scoring wall to wall.
  *
  * Scale posture: the bucket table is `buckets` rows (thousands) —
  * broadcast both ways; the corpus is touched by ONE gram explode + count
  * aggregate per side at fit time and one explode + broadcast-join +
  * decimal-mean aggregate at scoring time. No corpus-scale shuffle other
  * than the per-doc score aggregation (map-side combined). Selection is
  * `orderBy(...).limit(k)` — Catalyst plans TakeOrderedAndProject, a
  * per-partition top-k plus a driver merge of k rows, never a global sort.
  */
object Dsir {

  /** Word unigrams + bigrams of an already-MATERIALIZED words array
    * (lambda-staging rule — see [[TextAnalysis]] header).
    */
  private def gramsOfWords(words: Column): Column =
    concat(
      words,
      when(size(words) >= 2,
        transform(sequence(lit(0), size(words) - 2),
          i => concat_ws(" ", slice(words, i + 1, lit(2)))))
        .otherwise(array().cast("array<string>")))

  /** (id, bucket) rows: every unigram/bigram occurrence of every document,
    * hashed into [0, buckets).
    */
  private def bucketed(df: DataFrame, idCol: String, text: Column, buckets: Int): DataFrame =
    df.select(col(idCol),
        filter(split(Dedup.normalizeText(text), " "), w => length(w) > 0).as("__words"))
      .select(col(idCol), explode(gramsOfWords(col("__words"))).as("__g"))
      .select(col(idCol), (Dedup.md5Hash60(col("__g")) % buckets).as("bucket"))

  /** Fit the per-bucket log-likelihood ratios: for each hash bucket b,
    * r_b = round6(ln p_target(b)) − round6(ln p_source(b)) (rounded once
    * more at 6 dp), with add-one smoothing p(b) = (c_b + 1)/(C + B) so
    * buckets unseen on either side stay finite. Buckets seen on NEITHER
    * side still get a row (ratio of the two floors) — scoring never needs
    * an OOV fallback: every possible hash value has a ratio.
    *
    * Both count aggregates are corpus-linear with map-side combine; the
    * result is exactly `buckets` rows. Returns (bucket, log_ratio).
    */
  def fitLogRatios(target: DataFrame, source: DataFrame, idCol: String, text: Column,
                   buckets: Int = 4096): DataFrame =
    fitFromBucketed(bucketed(target, idCol, text, buckets),
      bucketed(source, idCol, text, buckets), buckets)

  /** [[fitLogRatios]] over pre-bucketed (id, bucket) sides — the split
    * that lets [[fitAndScore]] share the source side's gram explode with
    * the scoring pass instead of running it twice (r16).
    */
  private def fitFromBucketed(bTarget: DataFrame, bSource: DataFrame,
                              buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // pinned: each side's bucket-count table feeds BOTH the ratio join and
    // its total aggregate — unpinned, the corpus-scale gram explode + count
    // would execute twice per side (caller releases via OpCaches, like
    // every operator-internal persist)
    def side(b: DataFrame, cName: String): DataFrame = OpCaches.pin(
      b.groupBy("bucket").agg(count(lit(1)).as(cName)))
    val spark = bTarget.sparkSession
    // dense bucket spine: every bucket gets a ratio, seen or not
    val spine = spark.range(buckets).select(col("id").as("bucket"))
    val t = side(bTarget, "__ct")
    val s = side(bSource, "__cs")
    // totals as 1-row broadcast aggregates (C_t, C_s are corpus facts)
    val tot = t.agg(sum(col("__ct")).as("__tt")).crossJoin(s.agg(sum(col("__cs")).as("__ts")))
    def logp(c: Column, tot: Column): Column =
      round(log((c + 1).cast("double") / (coalesce(tot, lit(0L)) + buckets).cast("double")), 6)
    spine.join(t, Seq("bucket"), "left").join(s, Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bucket"),
        round(logp(coalesce(col("__ct"), lit(0L)), col("__tt")) -
              logp(coalesce(col("__cs"), lit(0L)), col("__ts")), 6).as("log_ratio"))
  }

  /** Score every document: dsir_score = round6(mean over gram occurrences
    * of its bucket's log_ratio), via the exact-DECIMAL(18,6) addend sum.
    * Documents with no grams are dropped (no evidence, no score — the
    * quality family handles empty docs). Returns
    * (idCol, n_grams, dsir_score).
    */
  def score(df: DataFrame, idCol: String, text: Column, ratios: DataFrame,
            buckets: Int = 4096): DataFrame =
    scoreBucketed(bucketed(df, idCol, text, buckets), idCol, ratios)

  private def scoreBucketed(b: DataFrame, idCol: String, ratios: DataFrame): DataFrame =
    b.join(broadcast(ratios), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        round(sum(col("log_ratio").cast(DecimalType(18, 6))).cast("double") / count(lit(1)), 6)
          .as("dsir_score"))

  /** Fit on (target, source) and score the SOURCE side in one call —
    * bit-identical to `score(source, …, fitLogRatios(target, source, …))`
    * (the fit and the scoring see exactly the same (id, bucket) rows), but
    * the source corpus' gram explode + md5 bucketing — the operator's
    * dominant cost — runs ONCE, pinned, instead of once for the fit's
    * count aggregate and again for scoring (r16; caller releases via
    * OpCaches).
    */
  def fitAndScore(target: DataFrame, source: DataFrame, idCol: String, text: Column,
                  buckets: Int = 4096): DataFrame = {
    val bSource = OpCaches.pin(bucketed(source, idCol, text, buckets))
    val ratios = fitFromBucketed(bucketed(target, idCol, text, buckets), bSource, buckets)
    scoreBucketed(bSource, idCol, ratios)
  }

  /** The selection step: the `k` documents whose features look most like
    * the target domain, deterministic ties by id. `orderBy + limit` plans
    * as TakeOrderedAndProject (per-partition heaps, driver merges k rows —
    * no global sort at any corpus size). The paper resamples with Gumbel
    * noise for diversity; with md5-derived features the ranking is already
    * reproducible, and a noisy variant is one `hashUnit` perturbation away.
    */
  def topK(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.orderBy(col("dsir_score").desc, col(idCol)).limit(k)
}
