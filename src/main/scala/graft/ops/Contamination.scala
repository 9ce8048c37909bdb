package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination (SURVEY.md §2.12 extension surface): flag
  * training documents that share word n-grams with an evaluation/benchmark
  * set, the standard guard against test-set leakage into a training corpus.
  *
  * Shape: the benchmark side is SMALL (eval suites are thousands of
  * documents, the training side is the 100 TB corpus), so the benchmark's
  * distinct shingle-hash set is broadcast and the training side never
  * shuffles its text — each training partition streams its shingles
  * through the broadcast hash set, and only (doc_id, matched-gram) pairs
  * reach the one aggregation keyed by doc id (map-side combined). There is
  * no self-join and no all-pairs surface anywhere; cost is one linear scan
  * of the corpus.
  */
object Contamination {

  /** Distinct (id, gram-hash) rows for `n`-word shingles of `text` —
    * staged normalization (see [[Dedup.explodedShingles]]) and the
    * portable md5-60 hash, so the oracle can replay the hashes.
    */
  private def gramHashes(df: DataFrame, idCol: String, text: Column, n: Int): DataFrame =
    Dedup.explodedShingles(df, idCol, text, n)
      .select(col(idCol), Dedup.md5Hash60(col("__sh")).as("__g"))
      .distinct()

  /** Per-training-document contamination report: documents sharing at
    * least `minOverlap` distinct `n`-grams with the benchmark set, with
    * the count of distinct shared grams (the triage signal — one shared
    * gram in a long doc is noise, fifty is a copied passage).
    *
    * Output: (idCol, n_overlap_grams), contaminated docs only.
    */
  def contaminationReport(train: DataFrame, benchmark: DataFrame, idCol: String,
                          text: Column, n: Int = 3, minOverlap: Int = 1): DataFrame = {
    val benchGrams = broadcast(
      gramHashes(benchmark, idCol, text, n).select(col("__g")).distinct())
    gramHashes(train, idCol, text, n)
      .join(benchGrams, "__g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap_grams")) // grams are pre-distinct per doc
      .where(col("n_overlap_grams") >= minOverlap)
  }

  /** Decontaminated corpus: `train` minus every row [[contaminationReport]]
    * flags — a broadcast-able anti-join when the flagged set is small, a
    * shuffled anti-join otherwise (Spark decides from size stats; AQE
    * re-plans at runtime).
    */
  def decontaminate(train: DataFrame, benchmark: DataFrame, idCol: String,
                    text: Column, n: Int = 3, minOverlap: Int = 1): DataFrame =
    train.join(contaminationReport(train, benchmark, idCol, text, n, minOverlap)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** The benchmark's distinct gram-hash set as driver values — the bounded
    * artifact a STREAMING admission filter closes over (eval suites are
    * small by definition; re-derive when the benchmark set changes).
    */
  def benchmarkGramSet(benchmark: DataFrame, idCol: String, text: Column, n: Int = 3): Array[Long] =
    gramHashes(benchmark, idCol, text, n)
      .select(col("__g")).distinct().collect().map(_.getLong(0))

  /** Ceiling on the gram set a STREAMING admission expression may embed:
    * the literal list lives in the plan, and streaming re-analyzes the
    * plan every micro-batch — a corpus-sized set would turn each batch's
    * planning into a multi-million-node tree walk. Eval suites sit far
    * below this; anything above it belongs in the batch broadcast-join
    * form ([[contaminationReport]]), whose gram set never enters a plan.
    */
  val MaxStreamingGrams: Int = 1 << 20

  /** Per-row contamination count over a MATERIALIZED word-array column —
    * a pure projection (Catalyst compiles `isInCollection` over the
    * literal gram list to an O(1) hash-set probe per gram), so it runs
    * STATELESS in a streaming query: no aggregation, no watermark, no
    * state store. This is the streaming admission form of
    * [[contaminationReport]] — each arriving document is checked against
    * the fixed benchmark the moment it arrives. Gram sets above
    * [[MaxStreamingGrams]] are rejected rather than silently degrading
    * per-batch planning (use the batch join form for those).
    */
  def overlapCountOfWords(words: Column, benchGrams: Array[Long], n: Int = 3): Column = {
    require(benchGrams.length <= MaxStreamingGrams,
      s"benchmark gram set (${benchGrams.length}) exceeds MaxStreamingGrams " +
        s"($MaxStreamingGrams): embed-in-plan streaming admission is for eval-suite-sized " +
        "sets; decontaminate corpus-scale sets with the batch broadcast join")
    size(filter(Dedup.shinglesOfWords(words, n),
      g => Dedup.md5Hash60(g).isInCollection(benchGrams.toSeq)))
  }

  /** Streaming-safe decontamination filter: keep rows whose text shares
    * fewer than `minOverlap` grams with the (pre-collected) benchmark set.
    * The word array is staged in its own projection first (interpreted
    * lambdas re-evaluate captured expressions PER ELEMENT — the
    * [[TextAnalysis]] staging rule).
    */
  def admitClean(df: DataFrame, text: Column, benchGrams: Array[Long],
                 n: Int = 3, minOverlap: Int = 1): DataFrame = {
    val staged = df.withColumn("__adm_w", TextAnalysis.words(text))
      .withColumn("__adm_n", overlapCountOfWords(col("__adm_w"), benchGrams, n))
    staged.where(col("__adm_n") < minOverlap).drop("__adm_w", "__adm_n")
  }
}
