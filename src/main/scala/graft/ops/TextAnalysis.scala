package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Text-analysis operators for training-data pipelines (SURVEY.md §2.12 X5):
  * language ID (stopword-vote heuristic), quality scoring, token counting,
  * and document fingerprinting. Per-row, no shuffles; linear scans that
  * scale trivially.
  *
  * Staging note: higher-order lambdas are interpreted and re-evaluate any
  * expression they close over once PER ELEMENT — so every operator here
  * materializes the normalized text / word array in its own projection
  * before a lambda touches it (24s -> sub-second on the sf0.1 bench for the
  * fingerprint op).
  */
object TextAnalysis {

  /** Whitespace word tokens of normalized text. */
  def words(text: Column): Column =
    filter(split(Dedup.normalizeText(text), " "), w => length(w) > 0)

  private def wordsOfNorm(norm: Column): Column =
    filter(split(norm, " "), w => length(w) > 0)

  /** BPE-ish subword-boundary token count: runs of letters, runs of digits,
    * or single non-alphanumeric glyphs (a cheap proxy for a real tokenizer's
    * token count; the regex is portable RE2/Java syntax).
    */
  val TokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(Dedup.normalizeText(text), lit(TokenPattern), lit(0)))

  /** Small per-language stopword dictionaries for the n-gram/stopword-vote
    * language-ID heuristic. Deliberately tiny: the vote, the tie rule and
    * the unknown fallback are the semantics under test.
    */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "los", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une"),
    "zh" -> Seq("de0", "shi0", "le0", "bu0", "wo0", "zai0", "you0"))

  /** Language vote over a materialized word array: per language, count
    * tokens hitting its stopword list; predict the max-vote language (ties
    * broken by language code order), "und" when no list scores > 0.
    */
  def langIdFromWords(toks: Column): Column = {
    val scores: Seq[(String, Column)] = Stopwords.map { case (lang, sw) =>
      lang -> size(filter(toks, t => t.isInCollection(sw.map(lit(_)))))
    }
    // argmax with deterministic ties: fold in language order, strict >
    val (bestLang, _) = scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bl, bs), (lang, s)) => (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
    }
    val total = scores.map(_._2).reduce(_ + _)
    when(total > 0, bestLang).otherwise(lit("und"))
  }

  /** Column form (tests / ad-hoc); pipelines should use [[langId]] on a
    * DataFrame so the word array is staged once.
    */
  def langId(text: Column): Column = langIdFromWords(words(text))

  /** DataFrame form: (idCol, pred_lang) with the word array materialized. */
  def langId(df: DataFrame, idCol: String, text: Column): DataFrame =
    df.select(col(idCol), words(text).as("__w"))
      .select(col(idCol), langIdFromWords(col("__w")).as("pred_lang"))

  /** Quality metrics: word count, token count, mean word length, stopword
    * ratio, alpha ratio, plus a blended [0,1] quality score (heuristic
    * length/stopword blend in the style of public pretraining-data filters).
    * `carry` columns ride the staged scan unchanged (same contract as
    * [[stagedCounts]]) so a caller gating by another attribute needs no
    * corpus-scale re-join back to the input.
    */
  def qualityMetrics(df: DataFrame, idCol: String, text: Column,
                     carry: Seq[String] = Nil): DataFrame = {
    val staged = stagedCounts(df, idCol, text, carry)
    staged.select(col(idCol) +: carry.map(col) :+
      col("__nw").cast("long").as("n_words") :+
      col("__ntok").cast("long").as("n_tokens") :+
      round(meanWordLen, 6).as("mean_word_len") :+
      round(stopRatioExpr, 6).as("stopword_ratio") :+
      round(alphaRatioExpr, 6).as("alpha_ratio") :+
      blendedScore.as("quality_score"): _*)
  }

  /** Classifier-threshold sweep — the calibration report behind "pick the
    * filter threshold" decisions (FineWeb-Edu, Penedo et al.
    * arXiv:2406.17557, selects its educational-score cutoff exactly this
    * way): for each candidate threshold t, how many documents and tokens
    * survive `quality_score >= t`, plus the surviving fractions — in ONE
    * corpus scan. Sweeping K thresholds costs the same as sweeping one.
    *
    * Shape: the per-doc (score, tokens) projection feeds a single
    * hash-aggregate computing 2·K+2 conditional sums — no fan-out, no
    * join, no window (a K-way explode would shuffle K copies of every
    * doc's pair; the conditional-sum form shuffles exactly one partial-agg
    * row per map partition regardless of K or corpus size). The one-row
    * result unpivots through `inline` of a K-element literal-struct array
    * — driver-trivial. Fractions are IEEE double divisions of exact BIGINT
    * counts, rounded 6 dp, so the DuckDB twin reproduces them bit-for-bit.
    *
    * Output: (threshold, docs_kept, tokens_kept, doc_frac, token_frac),
    * one row per threshold, ascending.
    */
  def thresholdSweep(df: DataFrame, idCol: String, text: Column,
                     thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty && thresholds == thresholds.sorted &&
      thresholds.distinct == thresholds, s"thresholds must be sorted distinct: $thresholds")
    val m = qualityMetrics(df, idCol, text)
      .select(col("quality_score").as("__q"), col("n_tokens").as("__t"))
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("__nd"), sum(col("__t")).as("__nt")) ++
        thresholds.zipWithIndex.flatMap { case (t, i) => Seq(
          sum(when(col("__q") >= t, 1L).otherwise(0L)).as(s"__d$i"),
          sum(when(col("__q") >= t, col("__t")).otherwise(0L)).as(s"__k$i"))
        }
    val one = m.agg(aggs.head, aggs.tail: _*)
    val rows = array(thresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("threshold"),
        col(s"__d$i").as("docs_kept"),
        col(s"__k$i").as("tokens_kept"),
        round(col(s"__d$i").cast("double") / col("__nd").cast("double"), 6).as("doc_frac"),
        round(col(s"__k$i").cast("double") / col("__nt").cast("double"), 6).as("token_frac"))
    }: _*)
    one.select(inline(rows)).orderBy("threshold")
  }

  /** Mean word length over [[stagedCounts]] columns (unrounded) — ONE
    * definition shared by [[qualityMetrics]], [[blendedScore]] and
    * [[gopherRules]] so the metric cannot drift between the emitters and
    * the rule filter that promises bit-parity with them.
    */
  private def meanWordLen: Column =
    col("__sumlen").cast("double") / greatest(col("__nw"), lit(1)).cast("double")

  /** Alphabetic-character fraction of the staged normalized text
    * (unrounded) — shared for the same reason as [[meanWordLen]].
    */
  private def alphaRatioExpr: Column =
    length(regexp_replace(col("__n"), "[^a-z]", "")).cast("double") /
      greatest(length(col("__n")), lit(1)).cast("double")

  /** Stopword fraction over [[stagedCounts]] columns (unrounded) — shared
    * for the same reason as [[meanWordLen]].
    */
  private def stopRatioExpr: Column =
    col("__nstop").cast("double") / greatest(col("__nw"), lit(1)).cast("double")

  /** Staged per-doc counts (`__n` norm text, `__w` word array, `__nw`,
    * `__sumlen`, `__nstop`, `__ntok`) shared by [[qualityMetrics]] and
    * [[cleanCorpus]] so the score formula can't drift between them.
    * `carry` columns ride the scan unchanged, so a caller grouping the
    * metrics by another attribute (e.g. [[Domains]] by source) needs no
    * re-join back to the input.
    */
  private[ops] def stagedCounts(df: DataFrame, idCol: String, text: Column,
                                carry: Seq[String] = Nil): DataFrame = {
    val cs = carry.map(col)
    df.select(col(idCol) +: cs :+ Dedup.normalizeText(text).as("__n"): _*)
      .select(col(idCol) +: cs ++: Seq(col("__n"), wordsOfNorm(col("__n")).as("__w")): _*)
      .select(col(idCol) +: cs ++: Seq(col("__n"), col("__w"),
        size(col("__w")).as("__nw"),
        aggregate(col("__w"), lit(0L), (acc, w) => acc + length(w)).as("__sumlen"),
        size(filter(col("__w"),
          t => t.isInCollection(Stopwords.flatMap(_._2).map(lit(_))))).as("__nstop"),
        size(regexp_extract_all(col("__n"), lit(TokenPattern), lit(0))).as("__ntok")): _*)
  }

  /** The blended quality score over a staged-counts frame — exposed for
    * [[Domains]], which aggregates it per source; same expression as
    * [[qualityMetrics]]'s `quality_score` column by construction.
    */
  private[ops] def blendedScoreCol: Column = blendedScore

  /** Blended [0,1] quality score over [[stagedCounts]] columns: enough
    * words, sane word length, some stopwords.
    */
  private def blendedScore: Column = {
    val lengthScore = least(col("__nw").cast("double") / lit(50.0), lit(1.0))
    val wordLenScore = when(meanWordLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    round((lengthScore + wordLenScore + least(stopRatioExpr * 5, lit(1.0))) / 3.0, 6)
  }

  /** End-to-end corpus cleaning — the canonical pretraining-data pipeline
    * (filter by language, filter by quality, drop exact duplicates) composed
    * in ONE scan: the language vote and the quality score share the staged
    * word array, the dedup key is the md5 of the already-staged normalized
    * text, and the only shuffle is the final keep-min hash aggregation on
    * the 32-char key — survivors' text never moves. At 100 TB this is a
    * map-side-filtered linear pass plus one agg on a bounded-width key.
    * Dups share identical normalized text, hence identical lang/score, so
    * those ride in the GROUP BY key (same groups as the md5 alone) — which
    * also keeps every aggregate primitive-typed, i.e. HashAggregate with
    * map-side combine instead of a min(string)-forced SortAggregate.
    */
  def cleanCorpus(df: DataFrame, idCol: String, text: Column,
                  minQuality: Double = 0.5, minWords: Int = 5): DataFrame = {
    val staged = stagedCounts(df, idCol, text)
      .select(col(idCol), col("__n"), col("__nw"),
        langIdFromWords(col("__w")).as("pred_lang"), blendedScore.as("quality_score"))
    staged
      .where(col("pred_lang") =!= "und" and col("quality_score") >= minQuality
        and col("__nw") >= minWords)
      .groupBy(md5(col("__n")).as("key_md5"), col("pred_lang"), col("quality_score"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))
      .select("keeper_id", "dup_count", "pred_lang", "quality_score", "key_md5")
  }

  /** Vocabulary top-k: the k most frequent word tokens with total
    * occurrences and document frequency. Two-phase: partial-aggregated
    * count per (token, doc) — the explode never shuffles raw text, only
    * (token, id) pairs with map-side combine — then a re-agg on `token`
    * alone over the already-collapsed per-doc counts. The final top-k is a
    * TakeOrdered (no global sort). Ties broken by token order.
    */
  def vocabTopK(df: DataFrame, idCol: String, text: Column, k: Int = 100): DataFrame = {
    val perDoc = df.select(col(idCol), explode(words(text)).as("token"))
      .groupBy(col("token"), col(idCol)).agg(count(lit(1)).as("__c"))
    perDoc.groupBy("token")
      .agg(sum("__c").as("n_occurrences"), count(lit(1)).as("doc_freq"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(k)
  }

  /** PII patterns in the Java/RE2 COMMON regex subset (no lookaround, no
    * backreferences) so Spark and any RE2 engine (the DuckDB oracle)
    * replace identically. Order matters and is part of the contract:
    * emails first (an address contains dots a later pattern could eat),
    * then IPs (dotted digits that the phone class would swallow), then
    * phone-like digit runs.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    """[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}""" -> "<EMAIL>",
    """\b(\d{1,3}\.){3}\d{1,3}\b""" -> "<IP>",
    """\+?\d[\d\s().-]{7,}\d""" -> "<PHONE>")

  /** PII-scrubbed text: emails, IPv4 addresses and phone-like digit runs
    * replaced by typed redaction tokens. Pure per-row projection — the
    * canonical pre-training scrub pass, zero shuffles at any scale.
    */
  def piiScrub(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, rep)) => regexp_replace(c, pat, rep) }

  /** Number of redaction tokens [[piiScrub]] inserts: each pattern is
    * counted on the text AFTER the earlier patterns were scrubbed (an IP
    * is also a phone-like digit run — counting every pattern on the raw
    * text would double-count it). Redaction tokens themselves are
    * match-proof: no digits, no '@'.
    */
  def piiCount(text: Column): Column =
    PiiPatterns.foldLeft((lit(0), text)) { case ((n, t), (pat, rep)) =>
      (n + size(regexp_extract_all(t, lit(pat), lit(0))), regexp_replace(t, pat, rep))
    }._1

  /** DataFrame form: (idCol, clean_text, n_pii). */
  def piiScrub(df: DataFrame, idCol: String, text: Column): DataFrame =
    df.select(col(idCol), text.as("__t"))
      .select(col(idCol), piiScrub(col("__t")).as("clean_text"),
        piiCount(col("__t")).cast("long").as("n_pii"))

  /** Repetition metrics in the style of the Gopher/MassiveText filters:
    * the fraction of words taken by the single most frequent word, and the
    * fraction of word 2-grams that are repeats of an earlier 2-gram.
    * High values flag boilerplate/spam documents that length and stopword
    * scores miss.
    *
    * Shape: one explode keyed by (doc, word) with map-side combine, one
    * distinct-2-gram count, one keyed join of the two per-doc aggregates —
    * nothing wider than (doc, token) ever shuffles.
    */
  def repetitionMetrics(df: DataFrame, idCol: String, text: Column): DataFrame =
    repetitionFromWords(df.select(col(idCol), words(text).as("__w")), idCol)

  /** [[repetitionMetrics]] over an ALREADY-staged word array (column
    * `__w`) — lets [[gopherRules]] reuse its stagedCounts word array
    * instead of normalizing and splitting the corpus a second time.
    */
  private def repetitionFromWords(staged: DataFrame, idCol: String): DataFrame = {
    val wordAgg = staged.select(col(idCol), explode(col("__w")).as("__t"))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("__nw"), max(col("__c")).as("__top"))
    val gram2 = staged
      .select(col(idCol), explode(Dedup.shinglesOfWords(col("__w"), 2)).as("__g"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("__n2d")) // shingles are pre-distinct
    wordAgg.join(gram2, Seq(idCol))
      .select(col(idCol),
        col("__nw").cast("long").as("n_words"),
        round(col("__top").cast("double") / col("__nw"), 6).as("top_word_frac"),
        // nw-1 total 2-grams; guard the 1-word doc (its "2-gram" is the
        // whole text, trivially distinct -> repetition 0)
        when(col("__nw") <= 1, lit(0.0))
          .otherwise(round(lit(1.0) - col("__n2d").cast("double") / (col("__nw") - 1), 6))
          .as("dup_2gram_frac"))
  }

  /** Within-doc repetition REMOVAL (the mutation companion to
    * [[repetitionMetrics]], which only scores): collapse every run of
    * consecutive identical normalized words to a single occurrence —
    * "buy now now now" → "buy now" — the cheapest of the MassiveText-style
    * repetition scrubs. Pure per-row projection over a higher-order filter
    * (no shuffle at any scale); engine-portable: DuckDB's indexed
    * `list_filter` reproduces the keep-first-of-run rule exactly.
    *
    * Output: (idCol, n_words, n_kept, clean_text).
    */
  def collapseRepeats(df: DataFrame, idCol: String, text: Column): DataFrame = {
    val staged = df.select(col(idCol), words(text).as("__w"))
    // keep word i (0-based) iff it is the first word or differs from its
    // predecessor; element_at is 1-based, so predecessor of i is index i
    val kept = filter(col("__w"), (w, i) => (i === 0) || (w =!= element_at(col("__w"), i)))
    staged.select(col(idCol),
      size(col("__w")).cast("long").as("n_words"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, " ").as("clean_text"))
  }

  /** Gopher-style quality-rule filter (Rae et al., arXiv:2112.11446,
    * appendix A1.1, as popularized by the MassiveText/RefinedWeb cleaning
    * recipes): each document gets a boolean verdict PER RULE plus the
    * conjunction (`keep`) — word-count bounds, mean-word-length bounds,
    * alphabetic-character floor, minimum stopword hits, top-word-fraction
    * and duplicate-2-gram ceilings. Emitting the per-rule flags (not just
    * the filter) is what makes the pass auditable: corpus-level rule-trip
    * rates are the standard diagnostic for tuning a cleaning recipe.
    *
    * Every flag compares a 6-dp-ROUNDED metric to its threshold — the same
    * rounded values [[qualityMetrics]]/[[repetitionMetrics]] emit and the
    * oracle reproduces bit-exactly — so the verdicts are engine-portable by
    * construction. Shape: the per-row staged counts plus the repetition
    * aggregates' (doc, token) shuffle; documents with no words fail
    * `rule_n_words` and carry `false` repetition flags.
    */
  def gopherRules(df: DataFrame, idCol: String, text: Column,
                  minWords: Long = 30, maxWords: Long = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  minAlphaRatio: Double = 0.6, minStopwords: Long = 1,
                  maxTopWordFrac: Double = 0.3, maxDup2gramFrac: Double = 0.3): DataFrame = {
    val staged = stagedCounts(df, idCol, text)
    val perRow = staged.select(col(idCol),
      col("__nw").cast("long").as("n_words"),
      col("__nw").between(minWords, maxWords).as("rule_n_words"),
      round(meanWordLen, 6).between(minMeanLen, maxMeanLen).as("rule_mean_word_len"),
      (round(alphaRatioExpr, 6) >= minAlphaRatio).as("rule_alpha_ratio"),
      (col("__nstop") >= minStopwords).as("rule_stopwords"))
    // reuse the staged word array: re-normalizing the corpus for the
    // repetition aggregates would double the dominant per-row cost
    val rep = repetitionFromWords(staged.select(col(idCol), col("__w")), idCol)
      .select(col(idCol), (col("top_word_frac") <= maxTopWordFrac).as("rule_top_word"),
        (col("dup_2gram_frac") <= maxDup2gramFrac).as("rule_dup_2gram"))
    perRow.join(rep, Seq(idCol), "left")
      .select(col(idCol), col("n_words"),
        col("rule_n_words"), col("rule_mean_word_len"), col("rule_alpha_ratio"),
        col("rule_stopwords"),
        coalesce(col("rule_top_word"), lit(false)).as("rule_top_word"),
        coalesce(col("rule_dup_2gram"), lit(false)).as("rule_dup_2gram"))
      .withColumn("keep",
        col("rule_n_words") && col("rule_mean_word_len") && col("rule_alpha_ratio") &&
          col("rule_stopwords") && col("rule_top_word") && col("rule_dup_2gram"))
  }

  /** Character trigrams of the staged normalized text: positions 1..len-2,
    * one gram per position (docs shorter than 3 chars get their whole text
    * as the single "gram"). Shared by the LM fit and scoring passes so the
    * gram definition cannot drift between them.
    */
  private def charTrigrams(norm: Column): Column =
    when(length(norm) >= 3,
      transform(sequence(lit(1), length(norm) - 2), i => norm.substr(i, lit(3))))
      .otherwise(array(norm))

  /** Character-trigram language-model fit — the CCNet-style "familiarity"
    * model (Wenzek et al., arXiv:1911.00359 use a 5-gram KenLM; a char
    * trigram model is its engine-portable small sibling): add-one-smoothed
    * log-probabilities over the trigrams of a deterministic md5 sample of
    * the corpus. The fit is FULLY DISTRIBUTED — one explode + count
    * aggregation, no driver-side training — and the model table is bounded
    * by the charset cubed (tens of thousands of rows), broadcastable at any
    * corpus size.
    *
    * Portability: log-probs are ln((c+1)/(C+V)) ROUNDED to 6 dp at the
    * model boundary — `ln` agrees across engines to 1 ulp, so rounded
    * values are stable; downstream sums go through exact DECIMAL so
    * aggregation order can never perturb a score.
    *
    * Returns (gram, logp). The unseen-gram floor ln(1/(C+V)) is what
    * [[lmScore]] substitutes for out-of-vocabulary grams.
    */
  def charTrigramLmFit(df: DataFrame, idCol: String, text: Column,
                       sampleFraction: Double = 0.2): DataFrame = {
    val sampled = Sampling.sampleByHash(df, idCol, sampleFraction)
    val grams = sampled.select(Dedup.normalizeText(text).as("__n"))
      .select(explode(charTrigrams(col("__n"))).as("gram"))
    val counts = grams.groupBy("gram").agg(count(lit(1)).as("__c"))
    // C (total grams) and V (vocab) over the tiny counts table: one
    // unpartitioned window, same bytes-sized pattern as mixtureSample
    counts
      .withColumn("__tot", sum(col("__c")).over(Window.partitionBy()))
      .withColumn("__v", count(lit(1)).over(Window.partitionBy()))
      .select(col("gram"),
        round(log((col("__c") + 1).cast("double") / (col("__tot") + col("__v")).cast("double")), 6)
          .as("logp"),
        col("__tot").as("__lmtot"), col("__v").as("__lmv"))
  }

  /** Per-document LM familiarity score over a fitted trigram model: the
    * mean log-probability of the document's trigrams (OOV grams take the
    * smoothing floor), plus the OOV fraction — the two signals a
    * CCNet-style perplexity bucket sort runs on. High (less negative)
    * scores = text that looks like the sample corpus; spam/garbage scores
    * low or heavily OOV.
    *
    * Shape: one explode keyed back by a broadcast join against the model
    * (bounded vocab), then an exact-DECIMAL mean per doc — rounded logps
    * are exact multiples of 1e-6, so the DECIMAL(18,6) cast and sum are
    * bit-identical in any engine regardless of aggregation order.
    */
  def lmScore(df: DataFrame, idCol: String, text: Column, lm: DataFrame): DataFrame = {
    // pinned: the model frame feeds BOTH the broadcast lookup and the floor
    // aggregate — unpinned, the whole trigram fit (sample scan + explode +
    // count agg) would execute twice per scoring run (caller releases via
    // OpCaches, like every operator-internal persist)
    val pinned = OpCaches.pin(lm)
    val model = broadcast(pinned.select(col("gram"), col("logp")))
    // the floor comes from an ungrouped AGGREGATE, which yields exactly one
    // row even over an empty model (max of empty = null): a degenerate fit
    // (empty sample) then scores every doc with NULL lm_score instead of
    // annihilating the output through an empty cross join — the same
    // one-row/NULL behavior as the oracle twin's ungrouped `tv` aggregate
    val floor = broadcast(pinned.agg(
      round(log(lit(1.0) / (max(col("__lmtot")) + max(col("__lmv"))).cast("double")), 6)
        .as("__floor")))
    val grams = df.select(col(idCol), Dedup.normalizeText(text).as("__n"))
      .select(col(idCol), explode(charTrigrams(col("__n"))).as("gram"))
    grams.join(model, Seq("gram"), "left").crossJoin(floor)
      .withColumn("__lp", coalesce(col("logp"), col("__floor")))
      .withColumn("__oov", when(col("logp").isNull, 1L).otherwise(0L))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        // micros: DECIMAL(18,6)·10^6 is an exact integer, so the mean can
        // round exactly instead of via double-divide-then-round (whose
        // quotient can land ON the .xxxxxx5 shortest-repr boundary and
        // round differently across engines — observed on 1 of 5000 docs
        // at the sf0.1 gate, FIXTURES.md r7)
        sum((col("__lp").cast(DecimalType(18, 6)) * 1000000).cast("long")).as("__su"),
        sum(col("__oov")).as("__oo"))
      .select(col(idCol), col("n_grams"),
        (halfUpRatio(col("__su"), col("n_grams")).cast("double") / 1000000.0).as("lm_score"),
        (halfUpRatio(col("__oo") * 1000000L, col("n_grams")).cast("double") / 1000000.0)
          .as("oov_frac"))
  }

  /** Exact HALF_UP (away-from-zero) rounding of the rational s/n to the
    * nearest integer — the engine-portable form of "divide then round to a
    * fixed scale" for integral s (micros) and positive n. `floor` over
    * double is exact here: operands stay far below 2^53 (|s| ≲ 2·10^15
    * even for 10^8-gram documents) and the quotient granularity 1/(2n)
    * dwarfs one ulp; the DuckDB twin uses integer `//` on the same
    * integers, which agrees by the same argument.
    */
  private def halfUpRatio(s: Column, n: Column): Column =
    when(s >= 0, floor((s * 2 + n).cast("double") / (n * 2)))
      .otherwise(-floor(((s * -1) * 2 + n).cast("double") / (n * 2)))
      .cast("long")

  /** Per-document TF-IDF keyword extraction: the `k` highest-scoring word
    * tokens of each document under the sklearn-style smoothed IDF
    * (idf = ln((1+N)/(1+df)) + 1, score = tf · idf) — the cheap
    * "what is this document about" signal used for corpus exploration,
    * topic bucketing and keyword-based decontamination.
    *
    * Shape: one (doc, token) count aggregation with map-side combine, a
    * token-keyed document-frequency re-aggregation over the ALREADY
    * collapsed per-doc rows (vocab-sized, broadcast back), and a per-doc
    * top-k window. IDFs are rounded to 6 dp before the multiply so scores
    * and ranks are engine-portable; ties break toward the lexicographically
    * smaller token.
    */
  def tfidfKeywords(df: DataFrame, idCol: String, text: Column, k: Int = 3): DataFrame = {
    val tf = df.select(col(idCol), explode(words(text)).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("token").agg(count(lit(1)).as("__df"))
    val nDocs = df.agg(count(lit(1)).as("__nd"))
    val idf = docFreq.crossJoin(broadcast(nDocs))
      .select(col("token"),
        round(log((lit(1) + col("__nd")).cast("double") / (lit(1) + col("__df")).cast("double")) + 1, 6)
          .as("idf"))
    val scored = tf.join(broadcast(idf), "token")
      .withColumn("score", round(col("tf").cast("double") * col("idf"), 6))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("token"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank").cast("long").as("rank"), col("token"),
        col("tf"), col("score"))
  }

  /** BM25 retrieval over the corpus (Robertson/Spärck Jones, the standard
    * probabilistic ranking function): for each query string, the `topK`
    * highest-scoring documents under
    * score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl)),
    * idf(t) = ln(1 + (N−df+0.5)/(df+0.5)). This is the keyword-search
    * surface of the engine — eval-set leakage hunts and corpus exploration
    * both reduce to "find the documents most like this string".
    *
    * Shape: query terms form a tiny broadcast table; candidate docs come
    * from a semi-join-style inner join on token (docs sharing no query
    * term never score, exactly the inverted-index access path); per-term
    * idf and the corpus stats (N, avgdl) are vocab-/scalar-sized
    * broadcasts. IDFs round to 6 dp, per-term contributions sum through
    * exact DECIMAL, final scores round to 6 dp — ranks engine-portable,
    * doc-id tiebreak.
    */
  def bm25Search(df: DataFrame, idCol: String, text: Column,
                 queries: Seq[(String, String)], topK: Int = 10,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (scored, _) = bm25Scored(df, idCol, text, queries, k1, b)
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col(idCol),
        col("score"), col("n_terms"))
  }

  /** Hard negatives for retrieval training: the top-BM25-scoring docs
    * that do NOT match every in-vocabulary query term — high lexical
    * similarity without full relevance, the examples a reranker /
    * embedding model learns the most from (the standard BM25-negatives
    * mining recipe). Positives-by-definition (all in-vocab terms
    * matched) are excluded; everything else ranks by the same
    * engine-portable score as [[bm25Search]], so the twin reuses the
    * search twin's arithmetic verbatim plus one filter.
    */
  def bm25HardNegatives(df: DataFrame, idCol: String, text: Column,
                        queries: Seq[(String, String)], topK: Int = 10,
                        k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (scored, qTermCounts) = bm25Scored(df, idCol, text, queries, k1, b)
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col(idCol))
    scored.join(broadcast(qTermCounts), "query_id")
      .where(col("n_terms") < col("__n_qterms"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col(idCol),
        col("score"), col("n_terms"), col("__n_qterms").as("n_query_terms"))
  }

  /** Shared BM25 scoring stage: (scored docs, per-query in-vocab term
    * counts). Scored = (query_id, id, score, n_terms) for every doc
    * sharing at least one term with the query.
    */
  private def bm25Scored(df: DataFrame, idCol: String, text: Column,
                         queries: Seq[(String, String)],
                         k1: Double, b: Double): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    val docWords = df.select(col(idCol), words(text).as("__w"))
      .select(col(idCol), size(col("__w")).cast("long").as("__dl"), col("__w"))
    val tf = docWords.select(col(idCol), col("__dl"), explode(col("__w")).as("token"))
      .groupBy(col(idCol), col("__dl"), col("token")).agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("token").agg(count(lit(1)).as("__df"))
    // corpus stats: N and average doc length (exact integer sums -> one
    // double division, identical in any engine)
    val stats = docWords.agg(count(lit(1)).as("__nd"), sum(col("__dl")).as("__sumdl"))
    val qTerms = queries.toDF("query_id", "__qtext")
      .select(col("query_id"), explode_outer(words(col("__qtext"))).as("token")).distinct()
    val idf = qTerms.join(docFreq, Seq("token")).crossJoin(broadcast(stats))
      .select(col("query_id"), col("token"),
        round(log(lit(1.0) +
          (col("__nd").cast("double") - col("__df") + 0.5) / (col("__df").cast("double") + 0.5)), 6)
          .as("idf"),
        col("__nd"), col("__sumdl"))
    val perTerm = tf.join(broadcast(idf), "token")
      .withColumn("__avgdl", col("__sumdl").cast("double") / col("__nd").cast("double"))
      // constant subexpressions (k1+1, 1-b) fold on the driver so the twin
      // can write the same plain literals
      .withColumn("__contrib", round(
        col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1 - b) + lit(b) * col("__dl").cast("double") / col("__avgdl"))), 6))
    val scored = perTerm.groupBy(col("query_id"), col(idCol))
      .agg(round(sum(col("__contrib").cast(DecimalType(18, 6))).cast("double"), 6).as("score"),
        count(lit(1)).as("n_terms"))
    val qTermCounts = idf.groupBy("query_id")
      .agg(countDistinct(col("token")).as("__n_qterms"))
    (scored, qTermCounts)
  }

  /** Document fingerprints: md5 of the normalized text (exact-dup key) and a
    * winnowing-style shingle fingerprint — the minimum md5 over all
    * character 8-grams (a locality-sensitive "smallest shingle wins"
    * selection, stable under edits far from the minimal shingle). md5 keeps
    * it portable: identical digests in any engine.
    */
  def fingerprints(df: DataFrame, idCol: String, text: Column, gram: Int = 8,
                   stride: Int = 2): DataFrame = {
    val staged = df.select(col(idCol), Dedup.normalizeText(text).as("__n"))
    val norm = col("__n")
    // winnowing stride: sampling every `stride`-th gram halves the digest
    // work; the min-gram selection stays locality-sensitive because grams
    // overlap by gram-stride characters
    val grams = when(length(norm) >= gram,
      transform(sequence(lit(1), length(norm) - (gram - 1), lit(stride)), i => norm.substr(i, lit(gram))))
      .otherwise(array(norm))
    // min over exploded grams: md5 runs inside codegen (the transform+
    // array_min form evaluates md5 through the interpreter per element) and
    // the min aggregate combines map-side — one tiny shuffle row per doc
    staged.select(col(idCol), md5(norm).as("doc_md5"), explode(grams).as("__g"))
      .groupBy(col(idCol), col("doc_md5"))
      .agg(min(md5(col("__g"))).as("min_gram_md5"))
  }

  /** X6z: Zipf-law fit of the corpus frequency spectrum — the one-number
    * statistical profile of a token distribution (Zipf's law: freq ∝
    * rank^-α, α ≈ 1 for natural language; a corpus whose α drifts far from
    * its reference is boilerplate-heavy or template-generated, which makes
    * this a cheap corpus-health gate). OLS of ln(freq) on ln(rank) over
    * the FULL vocabulary, in closed form from six aggregate sums.
    *
    * Scale shape: one token-count aggregation over the corpus (the
    * vocab-sized result is bounded by the charset/vocabulary, like the LM
    * fit), one unpartitioned rank window over that bounded vocab table,
    * one global agg to the six sums, and a single-row projection. The
    * corpus is touched exactly once.
    *
    * Portability: ln agrees across engines to 1 ulp only, so both lns are
    * rounded to 6 dp at the model boundary; pair products are rounded to
    * 6 dp and summed through exact DECIMAL(18,6) (order-free), and the
    * closed-form combination runs in doubles with a fixed parenthesization
    * mirrored by the twin. Rank ties (equal frequencies) cannot move the
    * result: x depends only on rank, y only on frequency, so the sums are
    * invariant to tie order.
    *
    * Output: one row (n_types, n_tokens, alpha, intercept, r2), 6 dp.
    */
  /** X6pm: PMI collocations — the top-k adjacent word pairs by pointwise
    * mutual information, the classic corpus-analysis signal for
    * multi-word expressions (Church & Hanks, CL'90) and a template /
    * boilerplate detector (machine-generated corpora over-represent a few
    * collocations).
    *
    * Scale shape: bigrams are built map-side from the per-doc word array
    * (`transform` over an index sequence — no window, no self-join, no
    * per-doc shuffle), then ONE count agg per table (unigram, bigram; both
    * map-side combined and vocabulary-bounded) plus two one-row totals
    * that ride a broadcast cross join. The final ranking runs over the
    * min-count-filtered bigram spine only — TakeOrderedAndProject, never a
    * corpus-scale sort. The corpus is touched exactly once.
    *
    * Portability: PMI = ln(c_ab·N²/(B·c_a·c_b)) is assembled from the five
    * 6-dp-rounded lns combined in exact DECIMAL(18,6) arithmetic (the
    * x5_lm_score discipline — each ln agrees across engines only to 1 ulp,
    * the decimal combination is then exact), so the ranking key is
    * bit-stable; ties break on (w1, w2).
    *
    * Output: top-k (w1, w2, n_pair, pmi), pmi descending.
    */
  def pmiCollocations(df: DataFrame, text: Column,
                      minCount: Long = 5, topK: Int = 50): DataFrame = {
    val ws = OpCaches.pin(df.select(words(text).as("__ws")))
    val uni = ws.select(explode(col("__ws")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__ca"))
    // bigram counts are pinned: the total B (over ALL bigrams — the PMI
    // denominator is the full event space, not the min-count survivors)
    // and the ranked spine both read them
    val bigAll = OpCaches.pin(ws.where(size(col("__ws")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("__ws")) - 2),
        i => struct(element_at(col("__ws"), i + 1).as("w1"),
          element_at(col("__ws"), i + 2).as("w2")))).as("__bg"))
      .select(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("__cab")))
    val big = bigAll.where(col("__cab") >= minCount)
    // one-row totals: vocabulary-bounded aggregates, broadcast back
    val totals = broadcast(uni.agg(sum(col("__ca")).as("__n")))
    val bTotal = broadcast(bigAll.agg(sum(col("__cab")).as("__b")))
    def lnr(c: Column) = round(log(c.cast("double")), 6).cast(DecimalType(18, 6))
    big
      .join(uni.select(col("__w").as("w1"), col("__ca").as("__c1")), "w1")
      .join(uni.select(col("__w").as("w2"), col("__ca").as("__c2")), "w2")
      .crossJoin(totals).crossJoin(bTotal)
      .select(col("w1"), col("w2"), col("__cab").as("n_pair"),
        (lnr(col("__cab")) + lnr(col("__n")) + lnr(col("__n"))
          - lnr(col("__b")) - lnr(col("__c1")) - lnr(col("__c2")))
          .cast("double").as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  def zipfFit(df: DataFrame, text: Column): DataFrame = {
    val counts = df.select(explode(words(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("__f"))
    val ranked = counts.withColumn("__r",
      row_number().over(Window.orderBy(col("__f").desc, col("token"))))
    val pts = ranked.select(col("__f"),
      round(log(col("__r").cast("double")), 6).as("__x"),
      round(log(col("__f").cast("double")), 6).as("__y"))
    def dsum(c: Column) = sum(c.cast(DecimalType(18, 6))).cast("double")
    val s = pts.agg(
      count(lit(1)).as("__n"),
      sum(col("__f")).as("__ntok"),
      dsum(col("__x")).as("__sx"),
      dsum(col("__y")).as("__sy"),
      dsum(round(col("__x") * col("__x"), 6)).as("__sxx"),
      dsum(round(col("__y") * col("__y"), 6)).as("__syy"),
      dsum(round(col("__x") * col("__y"), 6)).as("__sxy"))
    val num = col("__n") * col("__sxy") - col("__sx") * col("__sy")
    val den = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    // Degenerate spectra have no defined fit: a single token type (den = 0:
    // every x identical) or an all-equal frequency spectrum (deny = 0) emit
    // deliberate NULLs instead of NaN/Infinity — mirrored in the DuckDB twin.
    val deny = col("__n") * col("__syy") - col("__sy") * col("__sy")
    val slope = num / den
    s.select(
      col("__n").as("n_types"),
      col("__ntok").as("n_tokens"),
      when(den =!= 0.0, round(-slope, 6)).as("alpha"),
      when(den =!= 0.0, round((col("__sy") - slope * col("__sx")) / col("__n"), 6)).as("intercept"),
      when(den =!= 0.0 && deny =!= 0.0,
        round(num * num / (den * deny), 6)).as("r2"))
  }
}
