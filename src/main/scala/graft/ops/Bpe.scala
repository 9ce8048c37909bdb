package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge learning — the tokenizer-training precursor over a corpus
  * (the step after [[TextAnalysis.vocabTopK]]): starting from characters,
  * repeatedly merge the most frequent adjacent symbol pair across the
  * (frequency-weighted) vocabulary.
  *
  * Scale contract: fit-small, apply-distributed — the SAME shape as
  * [[Similarity.kmeansCells]]. ONE distributed pass builds the
  * word-frequency table; the top-`vocabCap` rows (one TakeOrdered job,
  * deterministic ties by word) come to the driver, and the merge loop
  * runs there over the bounded vocab — O(vocab · wordLen · numMerges)
  * driver work, zero further cluster jobs. A 100 TB corpus changes the
  * first pass only.
  *
  * Determinism & portability: the segmentation state is a padded
  * symbol-string (" l o w "), and a merge applies as `passes` rounds of
  * plain leftmost non-overlapping string replacement of " a b " with
  * " ab " — the ONE primitive every engine implements identically (no
  * regex). This is a documented deviation from canonical BPE: shared
  * boundary spaces make a single replace pass skip every other
  * occurrence in runs like "l l l l", so both engines run the same fixed
  * number of passes instead of a data-dependent fixpoint — bit-identical
  * merge tables by construction, asserted by the DuckDB oracle twin.
  * Ties in pair frequency break lexicographically (smallest left, then
  * right symbol).
  */
object Bpe {

  /** Padded symbol string of a word: " l o w " (boundary spaces let a
    * merge pattern " a b " match at word edges). Iterates CODE POINTS, not
    * UTF-16 units: the distributed apply side segments with regex '(.)'
    * (one code point per match in both Java and RE2), so splitting a
    * supplementary-plane character into surrogate halves here would learn
    * merges the apply pass can never match.
    */
  private[graft] def paddedSeg(word: String): String = {
    val sb = new StringBuilder(" ")
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      sb.appendAll(Character.toChars(cp)).append(' ')
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** One merge application: `passes` rounds of leftmost non-overlapping
    * replace — the JVM twin of the oracle's nested `replace()` calls.
    */
  private[graft] def applyMerge(seg: String, a: String, b: String, passes: Int): String = {
    var s = seg
    var i = 0
    while (i < passes) { s = s.replace(s" $a $b ", s" $a$b "); i += 1 }
    s
  }

  private[graft] def symbols(seg: String): Array[String] =
    seg.split(" ").filter(_.nonEmpty)

  /** Unsigned UTF-8 byte comparison — the binary collation SQL engines
    * apply in ORDER BY, equal to code-point order. Delegates to Spark's
    * own UTF8String comparator (the implementation behind the vocab
    * `orderBy` in [[learnMerges]]) so both code paths share one collation.
    */
  private[graft] val utf8Ordering: Ordering[String] = (a: String, b: String) =>
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** Learn `numMerges` merges over the corpus' top-`vocabCap` words (by
    * total occurrences). Returns (merge_rank, lhs, rhs, pair_freq) —
    * fewer rows iff the vocabulary runs out of adjacent pairs first.
    */
  def learnMerges(df: DataFrame, text: Column,
                  numMerges: Int = 8, vocabCap: Int = 500,
                  passes: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vocab: Array[(String, Long)] = df
      .select(explode(TextAnalysis.words(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(vocabCap)
      .as[(String, Long)].collect()
    var segs: Array[(String, Long)] = vocab.map { case (w, f) => (paddedSeg(w), f) }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var k = 1
    var exhausted = false
    while (k <= numMerges && !exhausted) {
      val weights = scala.collection.mutable.HashMap.empty[(String, String), Long]
      segs.foreach { case (seg, f) =>
        val t = symbols(seg)
        var i = 0
        while (i < t.length - 1) {
          val p = (t(i), t(i + 1))
          weights.update(p, weights.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (weights.isEmpty) exhausted = true
      else {
        // argmax weight, ties -> smallest (lhs, rhs) in UTF-8 BYTE order:
        // the oracle's ORDER BY uses binary collation over UTF-8, and Java
        // String.compareTo (UTF-16 units) disagrees with it for
        // supplementary-plane symbols (emoji sort before U+E000.. in
        // UTF-16, after in UTF-8)
        val ((a, b), w) = weights.minBy { case ((x, y), n) => (-n, x, y) }(
          Ordering.Tuple3(Ordering.Long, utf8Ordering, utf8Ordering))
        merges += ((k, a, b, w))
        segs = segs.map { case (seg, f) => (applyMerge(seg, a, b, passes), f) }
        k += 1
      }
    }
    merges.result().toDF("merge_rank", "lhs", "rhs", "pair_freq")
      .select(col("merge_rank").cast("long"), col("lhs"), col("rhs"), col("pair_freq"))
  }

  /** Distributed application: token count per document AFTER the learned
    * merges — the merge list is tiny and rides into the projection as
    * nested `replace` calls (codegen'd string ops, no UDF, no shuffle).
    *
    * Cost shape (r16): the merge fold is `numMerges × passes` string
    * replaces per evaluated word — evaluating it once per word OCCURRENCE
    * made this the hottest projection of the registry (64 replaces × every
    * token of the corpus). The fold is a pure function of the word, so it
    * now runs once per DISTINCT word (vocabulary-bounded — the same
    * fit-small observation as [[learnMerges]]) and rides back to the
    * occurrences through a broadcast join on the word. Occurrence sums are
    * unchanged: Σ_occurrences f(word) = Σ_occurrences (lookup f)(word),
    * so results are bit-identical (oracle-gated both scales).
    */
  def tokenCountWithMerges(df: DataFrame, idCol: String, text: Column,
                           merges: Seq[(String, String)], passes: Int = 8): DataFrame = {
    // explode_outer: a wordless (empty/null/whitespace) document must
    // report n_bpe_tokens = 0, like every per-doc report in this family —
    // plain explode would drop the doc from the output entirely
    val staged = df.select(col(idCol), TextAnalysis.words(text).as("__w"))
      .select(col(idCol), explode_outer(col("__w")).as("__word"))
    // left join: the null word of a wordless doc matches nothing and
    // coalesces to 0 — same value the old per-occurrence `when` produced
    staged.join(broadcast(distinctWordTokenCounts(staged, merges, passes)),
        Seq("__word"), "left")
      .select(col(idCol), coalesce(col("__n1"), lit(0)).as("__n"))
      .groupBy(col(idCol)).agg(sum(col("__n")).as("n_bpe_tokens"))
  }

  /** (__word, __n1) — the BPE token count of every distinct word of the
    * staged (…, __word) rows: the vocabulary-sized model-application table
    * both reports broadcast back to the occurrence stream.
    */
  private def distinctWordTokenCounts(staged: DataFrame,
                                      merges: Seq[(String, String)],
                                      passes: Int): DataFrame =
    staged.where(col("__word").isNotNull).select(col("__word")).distinct()
      .withColumn("__n1", bpeTokenCount(col("__word"), merges, passes))

  /** Per-word BPE token count as a pure codegen'd column expression: the
    * padded character segmentation folded through the merge table as
    * literal replaces — ONE definition shared by [[tokenCountWithMerges]]
    * and [[fertilityByGroup]] so the application semantics cannot drift
    * between the per-doc and per-group reports.
    *
    * r16: the fold uses the literal `replace` string function instead of
    * `regexp_replace(Pattern.quote(...))` — same leftmost non-overlapping
    * replacement semantics (the operator's defined primitive, scaladoc
    * above), no regex engine per evaluation, and no `$group`-reference
    * hazard in the replacement string.
    */
  private def bpeTokenCount(word: Column, merges: Seq[(String, String)], passes: Int): Column = {
    val seg0 = concat(lit(" "), regexp_replace(word, "(.)", "$1 "))
    val segN = merges.foldLeft(seg0) { case (seg, (a, b)) =>
      (1 to passes).foldLeft(seg)((s, _) => replace(s, lit(s" $a $b "), lit(s" $a$b ")))
    }
    size(filter(split(segN, " "), t => length(t) > 0))
  }

  /** Tokenizer fertility by group — mean BPE tokens per WORD for each
    * language/source under the learned merges: the multilingual
    * tokenizer-fairness number (a language with fertility 3 pays 3× the
    * sequence length per word — the metric multilingual tokenizer work
    * optimizes, e.g. the byte-premium analyses around XLM-R/UniMax vocab
    * allocation). A merge table learned on skewed data shows up here as a
    * fertility gap before any training run pays for it.
    *
    * Shape: same map-only nested-replace projection as
    * [[tokenCountWithMerges]], aggregated by group instead of doc — one
    * group-keyed count/sum agg (map-side combined, output = one row per
    * language). Words-only denominator: wordless docs contribute nothing
    * to a per-word ratio. Output: (groupCol, n_words, n_bpe_tokens,
    * fertility rounded 6), one row per group.
    */
  def fertilityByGroup(df: DataFrame, groupCol: String, text: Column,
                       merges: Seq[(String, String)], passes: Int = 8): DataFrame = {
    val staged = df.select(col(groupCol), TextAnalysis.words(text).as("__w"))
      .select(col(groupCol), explode(col("__w")).as("__word"))
    // distinct-word application + broadcast back (see tokenCountWithMerges):
    // plain explode emits no null words, so the join is inner and total
    staged.join(broadcast(distinctWordTokenCounts(staged, merges, passes)),
        Seq("__word"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__n1")).cast("long").as("n_bpe_tokens"))
      .withColumn("fertility",
        round(col("n_bpe_tokens").cast("double") /
          greatest(col("n_words"), lit(1L)).cast("double"), 6))
  }
}
