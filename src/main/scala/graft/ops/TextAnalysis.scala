package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY.md §2.12 X5):
  * language ID (stopword-vote heuristic), quality scoring, token counting,
  * and document fingerprinting. All Catalyst built-ins — per-row, no
  * shuffles, fully codegen'd; linear scans that scale trivially.
  */
object TextAnalysis {

  /** Whitespace word tokens of normalized text. */
  def words(text: Column): Column =
    filter(split(Dedup.normalizeText(text), " "), w => length(w) > 0)

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

  /** Language-ID: per language, count tokens hitting its stopword list;
    * predict the max-vote language (ties broken by language code order),
    * "und" when no list scores > 0.
    */
  def langId(text: Column): Column = {
    val toks = words(text)
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

  /** Quality metrics: word count, token count, mean word length, stopword
    * ratio, alpha ratio, plus a blended [0,1] quality score (heuristic
    * length/stopword blend in the style of public pretraining-data filters).
    */
  def qualityMetrics(df: DataFrame, idCol: String, text: Column): DataFrame = {
    val toks = words(text)
    val nWords = size(toks)
    val allStop = Stopwords.flatMap(_._2)
    val nStop = size(filter(toks, t => t.isInCollection(allStop.map(lit(_)))))
    val meanLen = aggregate(toks, lit(0L), (acc, w) => acc + length(w)).cast("double") /
      greatest(nWords, lit(1)).cast("double")
    val alphaRatio = length(regexp_replace(Dedup.normalizeText(text), "[^a-z]", "")).cast("double") /
      greatest(length(Dedup.normalizeText(text)), lit(1)).cast("double")
    val stopRatio = nStop.cast("double") / greatest(nWords, lit(1)).cast("double")
    // blended score: enough words, sane word length, some stopwords
    val lengthScore = least(nWords.cast("double") / lit(50.0), lit(1.0))
    val wordLenScore = when(meanLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    val score = round((lengthScore + wordLenScore + least(stopRatio * 5, lit(1.0))) / 3.0, 6)
    df.select(col(idCol),
      nWords.cast("long").as("n_words"),
      tokenCount(text).cast("long").as("n_tokens"),
      round(meanLen, 6).as("mean_word_len"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(alphaRatio, 6).as("alpha_ratio"),
      score.as("quality_score"))
  }

  /** Document fingerprints: md5 of the normalized text (exact-dup key) and a
    * winnowing-style shingle fingerprint — the minimum md5 over all
    * character 8-grams (a locality-sensitive "smallest shingle wins"
    * selection, stable under edits far from the minimal shingle). md5 keeps
    * it portable: identical digests in any engine.
    */
  def fingerprints(df: DataFrame, idCol: String, text: Column, gram: Int = 8): DataFrame = {
    val norm = Dedup.normalizeText(text)
    val grams = when(length(norm) >= gram,
      transform(sequence(lit(1), length(norm) - (gram - 1)), i => norm.substr(i, lit(gram))))
      .otherwise(array(norm))
    df.select(col(idCol),
      md5(norm).as("doc_md5"),
      array_min(transform(grams, g => md5(g))).as("min_gram_md5"))
  }
}
