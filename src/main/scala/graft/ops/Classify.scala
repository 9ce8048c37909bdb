package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Supervised document-quality classification (SURVEY.md §2.12 X5 family):
  * a multinomial Naive Bayes text classifier distilled from domain-level
  * weak supervision — the engine analog of the fastText quality filters
  * public pretraining pipelines train on "reference corpus vs crawl"
  * labels (CCNet's fastText LM buckets, GPT-3/LLaMA's Wikipedia-vs-
  * CommonCrawl logistic filters). The reference's admission decisions are
  * type-level gates (`/root/reference/app.js:20-27`); at corpus scale the
  * admission signal must come from the CONTENT, and a trained classifier
  * is the standard way to turn a weak corpus-level prior (domain trust)
  * into a per-document score.
  *
  * Why Naive Bayes and not logistic regression: NB training is a pair of
  * COUNT aggregations — one distributed pass, no iterative optimizer, no
  * driver-side gradient state — and its decision function is a sum of
  * per-token log-odds, which the engine can evaluate as a broadcast-join +
  * exact-DECIMAL aggregation. Same filtering power class as fastText's
  * linear classifier over unigram features, but closed-form and therefore
  * hash-checkable end to end.
  *
  * Scale posture: labels ride the corpus scan (one broadcast semi-style
  * join against the |domains|-row trust table); training is one
  * (class × token) count aggregation with map-side combine whose output is
  * VOCABULARY-sized, never corpus-sized; the model broadcasts to scoring,
  * where one explode + per-doc DECIMAL aggregation produces scores.
  * Corpus text never shuffles — the shuffled rows are (token, counts)
  * pairs bounded by the vocabulary, exactly the [[TextAnalysis.lmScore]]
  * posture.
  *
  * Determinism: log-probabilities are rounded to 6 dp at the model
  * boundary (`ln` agrees across engines to 1 ulp on identical doubles);
  * per-token log-odds differences of two 6-dp values are exact in
  * DECIMAL(18,6); per-doc sums are order-free DECIMAL — scores are
  * bit-identical in any md5-capable engine.
  */
object Classify {

  /** Multinomial NB model fit on domain-trust weak labels: each document
    * is labeled by [[Domains.domainStats]]' verdict for its domain
    * (trusted = positive class), then per-class add-one-smoothed token
    * log-probabilities are computed over the whole labeled corpus.
    *
    * Output: one row per training token —
    * (token, lp_pos, lp_neg) plus the class totals every row carries for
    * the floor/prior aggregates ([[TextAnalysis.charTrigramLmFit]]'s
    * carry-the-totals pattern): __ctp/__ctn (per-class token totals),
    * __v (vocabulary size), __npos/__nneg (per-class document counts).
    */
  def nbFitOnDomainTrust(df: DataFrame, idCol: String, domainCol: String,
                         text: Column, untrustedK: Int = 4): DataFrame =
    nbFitWithTrust(df, domainCol, text,
      Domains.domainStats(df, idCol, domainCol, text, untrustedK)
        .select(col(domainCol), col("trusted")))

  /** [[nbFitOnDomainTrust]] with the (domainCol, trusted) table supplied by
    * the caller — the shared-scan split (r16): a query that already derived
    * the trust verdicts (e.g. through [[featuresWithTrust]]) fits on them
    * directly instead of paying [[Domains.domainStats]]' corpus pass again.
    * Bit-identical when `trust` equals the internal derivation.
    */
  def nbFitWithTrust(df: DataFrame, domainCol: String, text: Column,
                     trust: DataFrame): DataFrame = {
    // the trust table is |domains|-sized: broadcast, corpus never shuffles
    val labeled = df.join(broadcast(trust.select(col(domainCol), col("trusted"))), Seq(domainCol))
      .select(col("trusted").as("__pos"), TextAnalysis.words(text).as("__ws"))
    // per-class document counts (priors): one tiny ungrouped aggregate
    val priors = labeled.agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).as("__npos"),
      sum(when(col("__pos"), 0L).otherwise(1L)).as("__nneg"))
    // (class × token) counts in ONE aggregation keyed by token only —
    // map-side combined, output vocabulary-sized
    val counts = labeled
      .select(col("__pos"), explode(col("__ws")).as("token"))
      .groupBy(col("token"))
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("__cp"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("__cn"))
    // class totals + vocab over the tiny counts table: unpartitioned
    // window bounded by |vocab|, the charTrigramLmFit pattern
    import org.apache.spark.sql.expressions.Window
    counts
      .withColumn("__ctp", sum(col("__cp")).over(Window.partitionBy()))
      .withColumn("__ctn", sum(col("__cn")).over(Window.partitionBy()))
      .withColumn("__v", count(lit(1)).over(Window.partitionBy()))
      .crossJoin(broadcast(priors))
      .select(col("token"),
        round(log((col("__cp") + 1).cast("double") / (col("__ctp") + col("__v")).cast("double")), 6)
          .as("lp_pos"),
        round(log((col("__cn") + 1).cast("double") / (col("__ctn") + col("__v")).cast("double")), 6)
          .as("lp_neg"),
        col("__ctp"), col("__ctn"), col("__v"), col("__npos"), col("__nneg"))
  }

  /** Score every document under a fitted NB model: the per-document
    * log-likelihood ratio
    * llr = ln P(pos) − ln P(neg) + Σ_tokens (lp_pos(t) − lp_neg(t)),
    * with out-of-vocabulary tokens taking each class's smoothing floor.
    * llr > 0 ⇒ the document looks like the trusted corpus.
    *
    * Output: (idCol, n_tokens, llr, pred). Documents with no tokens get
    * n_tokens = 0 and llr = the prior log-odds alone.
    */
  def nbScore(df: DataFrame, idCol: String, text: Column, model: DataFrame): DataFrame = {
    // pinned: the model feeds the broadcast lookup AND the floor/prior
    // aggregate — unpinned, the whole fit (trust scan + two count aggs)
    // would run twice (caller releases via OpCaches, house pattern)
    val pinned = OpCaches.pin(model)
    val m = broadcast(pinned.select(col("token"), col("lp_pos"), col("lp_neg")))
    // floors + priors from an ungrouped aggregate: exactly one row even on
    // a degenerate (empty) model, the lmScore one-row/NULL pattern
    val consts = broadcast(pinned.agg(
      round(log(lit(1.0) / (max(col("__ctp")) + max(col("__v"))).cast("double")), 6).as("__fp"),
      round(log(lit(1.0) / (max(col("__ctn")) + max(col("__v"))).cast("double")), 6).as("__fn"),
      round(log(max(col("__npos")).cast("double") /
        (max(col("__npos")) + max(col("__nneg"))).cast("double")), 6).as("__pp"),
      round(log(max(col("__nneg")).cast("double") /
        (max(col("__npos")) + max(col("__nneg"))).cast("double")), 6).as("__pn")))
    // explode_outer: zero-token documents keep their row (null token ⇒
    // zero contribution, not an OOV hit)
    val toks = df.select(col(idCol), explode_outer(TextAnalysis.words(text)).as("token"))
    toks.join(m, Seq("token"), "left").crossJoin(consts)
      .withColumn("__d",
        when(col("token").isNull, lit(0).cast(DecimalType(18, 6)))
          .otherwise(coalesce(col("lp_pos"), col("__fp")).cast(DecimalType(18, 6)) -
            coalesce(col("lp_neg"), col("__fn")).cast(DecimalType(18, 6))))
      .withColumn("__t", when(col("token").isNull, 0L).otherwise(1L))
      .groupBy(col(idCol))
      .agg(sum(col("__t")).as("n_tokens"),
        round((max(col("__pp")).cast(DecimalType(18, 6)) -
          max(col("__pn")).cast(DecimalType(18, 6)) + sum(col("__d"))).cast("double"), 6)
          .as("llr"))
      .withColumn("pred", col("llr") > 0)
  }

  // ------------------------------------------------------------------
  // Logistic regression: the in-engine ITERATIVE optimizer
  // ------------------------------------------------------------------

  /** Number of full-batch gradient-descent iterations the registered
    * logreg query trains for. Fixed (not a convergence test) so the
    * computation is a finite, replayable chain the DuckDB twin can unroll.
    */
  val LogregIters = 3

  /** Fixed learning rate for [[logregFitOnDomainTrust]]. With features in
    * [0,1] and a mean-gradient update, weights stay within ±(iters·lr).
    */
  val LogregLr = 4.0

  /** Engineered per-document features for the linear quality classifier —
    * deliberately LOW-dimensional (d = 4 incl. bias) where NB is
    * vocabulary-dimensional: this is the GPT-3/LLaMA-style "small linear
    * probe over document statistics" filter, and the tiny fixed dimension
    * is what makes full-batch gradient descent a per-iteration ungrouped
    * aggregate of d+1 numbers. Every feature is rounded to 6 dp at the
    * boundary so downstream decimal arithmetic is exact cross-engine.
    *
    * Output: (idCol, domainCol, x1 = 1 bias, x2 = blended quality score,
    * x3 = capped length nw/100, x4 = alpha ratio).
    */
  def logregFeatures(df: DataFrame, idCol: String, domainCol: String,
                     text: Column): DataFrame =
    TextAnalysis.qualityMetrics(df, idCol, text, carry = Seq(domainCol))
      .select(col(idCol), col(domainCol),
        lit(1.0).as("x1"),
        col("quality_score").as("x2"),
        round(least(col("n_words").cast("double") / lit(100.0), lit(1.0)), 6).as("x3"),
        col("alpha_ratio").as("x4"))

  /** z = w·x with the 6-dp weights and 6-dp features multiplied and summed
    * in exact DECIMAL — the double cast happens ONCE, at the sigmoid
    * boundary, so both engines see the identical rational value.
    */
  private def zOf(w: Seq[Double]): Column =
    (1 to 4).map(j =>
      lit(w(j - 1)).cast(DecimalType(18, 6)) * col(s"x$j").cast(DecimalType(18, 6)))
      .reduce(_ + _)

  /** round(σ(z), 6): exp agrees across engines to 1 ulp on identical
    * doubles (the [[nbFitOnDomainTrust]] ln precedent), and the 6-dp
    * rounding absorbs it.
    */
  private def sigmoid6(w: Seq[Double]): Column =
    round(lit(1.0) / (lit(1.0) + exp(-zOf(w).cast("double"))), 6)

  /** Driver-side HALF_UP 6-dp rounding — the same rule as SQL round(x,6)
    * in both engines, applied to the weight update.
    */
  private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Train a logistic-regression quality classifier on domain-trust weak
    * labels by FULL-BATCH gradient descent run inside the engine: per
    * iteration, ONE ungrouped aggregate over the pinned feature table
    * computes the exact-decimal gradient Σ (σ(w·x) − y)·x (d+1 numbers —
    * the only bytes that ever reach the driver), and the driver applies
    * w ← w − lr·g/n with 6-dp rounding. This is the canonical Spark
    * ML-training shape: K corpus passes over a cached projection a few
    * doubles wide, partial aggregation map-side, driver state = d doubles.
    * The reference admits entities by type (`/root/reference/app.js:20-27`);
    * at corpus scale the admission gate must be LEARNED from content, and
    * where [[nbFitOnDomainTrust]] shows the closed-form one-pass family,
    * this shows the iterative-optimizer family on the same weak labels.
    *
    * Determinism: features and weights are 6-dp at every boundary; z and
    * the gradient are exact DECIMAL; σ is the one double op per row and is
    * rounded 6 dp before it re-enters decimal arithmetic — the whole
    * K-iteration trajectory replays bit-for-bit in the DuckDB twin's
    * unrolled CTE chain.
    *
    * Returns the d = 4 learned weights (bias first).
    */
  def logregFitOnDomainTrust(df: DataFrame, idCol: String, domainCol: String,
                             text: Column, untrustedK: Int = 4,
                             iters: Int = LogregIters, lr: Double = LogregLr): Array[Double] = {
    val (feats, trust) = featuresWithTrust(df, idCol, domainCol, text, untrustedK)
    logregFitWithFeats(feats, trust, domainCol, iters, lr)
  }

  /** ONE corpus scan shared by the whole domain-trust classifier family
    * (r16): returns the PINNED per-doc feature table
    * (idCol, domainCol, x1..x4) and the (domainCol, …, trusted) trust table
    * derived from that same scan — x2 IS the blended quality score, so
    * [[Domains.domainTrustFromQuality]] over it equals
    * [[Domains.domainStats]] bit-for-bit (one shared aggregate definition).
    * Before this split, a fit+score query paid the quality pass three
    * times (trust, fit features, score features). Caller releases the pin
    * via OpCaches, house pattern.
    */
  def featuresWithTrust(df: DataFrame, idCol: String, domainCol: String, text: Column,
                        untrustedK: Int = 4): (DataFrame, DataFrame) = {
    val feats = OpCaches.pin(logregFeatures(df, idCol, domainCol, text))
    val trust = Domains.domainTrustFromQuality(
      feats.select(col(domainCol), col("x2").as("__q")), domainCol, untrustedK)
    (feats, trust)
  }

  /** The gradient-descent loop of [[logregFitOnDomainTrust]] over an
    * already-staged feature table (r16 split): `featsAll` must carry
    * x1..x4 and `domainCol` (the [[logregFeatures]] shape — normally the
    * pinned half of [[featuresWithTrust]]). Labeling joins the
    * |domains|-row trust table broadcast-style per iteration over the
    * pinned scan; the aggregate sums are order-free decimals, so the
    * weight trajectory is bit-identical to the one-call form.
    */
  def logregFitWithFeats(featsAll: DataFrame, trust: DataFrame, domainCol: String,
                         iters: Int = LogregIters, lr: Double = LogregLr): Array[Double] = {
    // the labeled projection is pinned SEPARATELY from featsAll: each GD
    // iteration is its own action, and unpinned it would re-run the trust
    // aggregate + label join per iteration (4 doubles + 1 decimal per row
    // — a cheap second cache that keeps the loop's per-action work at
    // "scan cached rows + one ungrouped agg", as the one-call form had)
    val feats = OpCaches.pin(featsAll
      .join(broadcast(trust.select(col(domainCol), col("trusted"))), Seq(domainCol))
      .select((1 to 4).map(j => col(s"x$j")) :+
        when(col("trusted"), lit(1)).otherwise(lit(0))
          .cast(DecimalType(18, 6)).as("__y"): _*))
    var w = Array.fill(4)(0.0)
    for (_ <- 0 until iters) {
      val resid = sigmoid6(w.toSeq).cast(DecimalType(18, 6)) - col("__y")
      val aggs = (1 to 4).map(j =>
        sum(resid * col(s"x$j").cast(DecimalType(18, 6))).as(s"g$j")) :+
        count(lit(1)).as("n")
      val row = feats.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getAs[Long]("n")
      if (n > 0L)
        w = Array.tabulate(4)(j =>
          round6(w(j) - lr * (row.getAs[java.math.BigDecimal](s"g${j + 1}").doubleValue() / n)))
    }
    w
  }

  /** Score every document under learned weights: one map-only projection,
    * score = round(σ(w·x), 6), pred = score > 0.5. Output
    * (idCol, score, pred) — the shape a curation gate consumes.
    */
  def logregScore(df: DataFrame, idCol: String, domainCol: String, text: Column,
                  w: Array[Double]): DataFrame =
    logregScoreWithFeats(logregFeatures(df, idCol, domainCol, text), idCol, w)

  /** [[logregScore]] over an already-staged feature table (r16 split) —
    * with the pinned [[featuresWithTrust]] scan, fit and score share one
    * corpus pass. Same projection, bit-identical scores.
    */
  def logregScoreWithFeats(featsAll: DataFrame, idCol: String,
                           w: Array[Double]): DataFrame =
    featsAll
      .select(col(idCol), sigmoid6(w.toSeq).as("score"))
      .withColumn("pred", col("score") > 0.5)

  /** Confusion-matrix evaluation of a classifier's (idCol, pred) against
    * (idCol, label): ONE scalar aggregate of four conditional sums, with
    * accuracy / precision / recall / F1 in exact integer MICRO-units —
    * acc_µ = 10^6·(tp+tn) div n, f1 via the single-division identity
    * f1 = 2tp/(2tp+fp+fn) — because divide-then-round double ratios are
    * not engine-portable on tie quotients (e.g. tp/(tp+fp) = 1/3200
    * lands exactly on a 6-dp rounding boundary; the PageRank lesson).
    * Degenerate denominators (no predicted / no actual positives) emit
    * −1, never NULL, so the report row is total.
    *
    * Output: one row (model, n, tp, fp, fn, tn, accuracy_micros,
    * precision_micros, recall_micros, f1_micros).
    */
  def confusionEval(name: String, labeled: DataFrame, predCol: String,
                    labelCol: String): DataFrame = {
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    val p = col(predCol)
    val l = col(labelCol)
    labeled.agg(
        count(lit(1)).as("n"),
        cnt(p && l).as("tp"), cnt(p && !l).as("fp"),
        cnt(!p && l).as("fn"), cnt(!p && !l).as("tn"))
      .select(lit(name).as("model"), col("n"), col("tp"), col("fp"),
        col("fn"), col("tn"),
        when(col("n") === 0L, lit(-1L))
          .otherwise(expr("(1000000 * (tp + tn)) div n")).as("accuracy_micros"),
        when(col("tp") + col("fp") === 0L, lit(-1L))
          .otherwise(expr("(1000000 * tp) div (tp + fp)")).as("precision_micros"),
        when(col("tp") + col("fn") === 0L, lit(-1L))
          .otherwise(expr("(1000000 * tp) div (tp + fn)")).as("recall_micros"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") === 0L, lit(-1L))
          .otherwise(expr("(2000000 * tp) div (2 * tp + fp + fn)")).as("f1_micros"))
  }
}
