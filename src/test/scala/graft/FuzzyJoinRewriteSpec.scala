package graft

import org.apache.spark.sql.functions._

/** The optimizer rewrite of naive levenshtein theta-joins: results must
  * equal the unrewritten join bit-for-bit (including duplicate-row
  * multiplicity and extra conjuncts), and the optimized plan must contain
  * NO cartesian/nested-loop pairing.
  */
class FuzzyJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def refDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // substitutions, inserts, deletes, repeats, an exact duplicate, far words
  private lazy val words = Seq("spark", "spork", "sprk", "sparkk", "spark",
    "scala", "scale", "whale", "zzzzz", "a", "b", "")
    .zipWithIndex.map { case (w, i) => (i.toLong, w) }

  private def brute(k: Int): Set[(Long, Long)] = (for {
    (ia, wa) <- words; (ib, wb) <- words if refDist(wa, wb) <= k
  } yield (ia, ib)).toSet

  test("naive levenshtein join is rewritten: same result, no cartesian pairing") {
    val a = words.toDF("id_a", "wa")
    val b = words.toDF("id_b", "wb")
    for (k <- Seq(0, 1)) {
      val joined = a.join(b, levenshtein(a("wa"), b("wb")) <= lit(k))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"k=$k: naive levenshtein join was not rewritten:\n$plan")
      assert(plan.contains("Generate"), s"k=$k: deletion-key expansion missing")
      val got = joined.select("id_a", "id_b").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"k=$k: rewrite duplicated pairs")
      assert(got.toSet == brute(k), s"k=$k: rewrite changed the result: " +
        s"missing=${brute(k) -- got.toSet} extra=${got.toSet -- brute(k)}")
    }
  }

  test("extra conjuncts ride along; multiplicity with duplicate rows matches the theta-join") {
    val a = words.toDF("id_a", "wa").union(words.take(2).toDF("id_a", "wa"))
    val b = words.toDF("id_b", "wb")
    val joined = a.join(b,
      levenshtein(a("wa"), b("wb")) <= lit(1) && a("id_a") < b("id_b"))
    val got = joined.groupBy("id_a", "id_b").count()
      .as[(Long, Long, Long)].collect().toSet
    val expect = brute(1).filter { case (ia, ib) => ia < ib }
      .map { case (ia, ib) => (ia, ib, if (ia <= 1L) 2L else 1L) }
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
  }

  test("out-of-scope joins are left untouched (bound 2, non-literal bound, outer, threshold form)") {
    val a = words.toDF("id_a", "wa")
    val b = words.toDF("id_b", "wb")
    // bound 2 needs the recursive neighborhood -> stays nested-loop, correct
    val wide = a.join(b, levenshtein(a("wa"), b("wb")) <= lit(2))
    assert(wide.queryExecution.executedPlan.toString().contains("BroadcastNestedLoopJoin"))
    assert(wide.select("id_a", "id_b").as[(Long, Long)].collect().toSet == brute(2))
    // outer joins keep their semantics (rewrite is inner-only)
    val outer = a.join(b, levenshtein(a("wa"), b("wb")) <= lit(1), "left")
    assert(outer.count() >= words.length)
    // the 3-arg threshold form chose its own shape: untouched
    val thr = a.join(b, levenshtein(a("wa"), b("wb"), 1) >= lit(0))
    assert(thr.queryExecution.executedPlan.toString().contains("BroadcastNestedLoopJoin"))
  }

  test("length scope: long strings band by length bucket — same result, no L+1-key explode") {
    // cap = 8: "abcdefg" (7 = cap-1, boundary), "abcdefgh" (8, long),
    // "abcdefghx" (9, long), an equal-length long substitution pair, a far
    // long word, plus short words — every pair class crosses the cap
    val mixed = Seq("abcdefg", "abcdefgh", "abcdefghx", "abcdefgX",
      "zzzzzzzzzz", "spark", "spork").zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val bruteM = (for {
      (ia, wa) <- mixed; (ib, wb) <- mixed if refDist(wa, wb) <= 1
    } yield (ia, ib)).toSet
    val a = mixed.toDF("id_a", "wa")
    val b = mixed.toDF("id_b", "wb")
    withSQLConf(graft.plans.FuzzyJoinRewrite.MaxLenKey -> "8") {
      val joined = a.join(b, levenshtein(a("wa"), b("wb")) <= lit(1))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"long-string join was not rewritten:\n$plan")
      val got = joined.select("id_a", "id_b").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, "length-bucket banding duplicated pairs")
      assert(got.toSet == bruteM, s"missing=${bruteM -- got.toSet} extra=${got.toSet -- bruteM}")
    }
  }

  test("maxLen <= 0 disables the rewrite (the user's nested loop stands)") {
    val a = words.toDF("id_a", "wa")
    val b = words.toDF("id_b", "wb")
    withSQLConf(graft.plans.FuzzyJoinRewrite.MaxLenKey -> "0") {
      val joined = a.join(b, levenshtein(a("wa"), b("wb")) <= lit(1))
      assert(joined.queryExecution.executedPlan.toString().contains("BroadcastNestedLoopJoin"))
      assert(joined.select("id_a", "id_b").as[(Long, Long)].collect().toSet == brute(1))
    }
  }

  test("a cosmetically different duplicate conjunct also gets the threshold form") {
    import org.apache.spark.sql.catalyst.expressions.Levenshtein
    words.toDF("id", "w").createOrReplaceTempView("fuzzy_words_dup")
    // same predicate twice with case-differing column references: structural
    // == misses the duplicate, semanticEquals must not
    val df = spark.sql(
      """SELECT a.id AS id_a, b.id AS id_b FROM fuzzy_words_dup a JOIN fuzzy_words_dup b
        |ON levenshtein(a.w, b.w) <= 1 AND levenshtein(a.W, b.W) <= 1 AND a.id < b.id""".stripMargin)
    val levs = df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case l: Levenshtein => l }) ++
      df.queryExecution.optimizedPlan.collect { case p => p.expressions }.flatten
        .flatMap(_.collect { case l: Levenshtein => l })
    assert(levs.nonEmpty)
    assert(levs.forall { case Levenshtein(_, _, t) => t.isDefined },
      s"an unbanded full-DP levenshtein survived: $levs")
    assert(df.as[(Long, Long)].collect().toSet == brute(1).filter { case (x, y) => x < y })
  }

  test("SQL path: a naive fuzzy self-join written in SQL gets the banded plan") {
    words.toDF("id", "w").createOrReplaceTempView("fuzzy_words")
    val df = spark.sql(
      """SELECT a.id AS id_a, b.id AS id_b FROM fuzzy_words a JOIN fuzzy_words b
        |ON levenshtein(a.w, b.w) <= 1 AND a.id < b.id""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"SQL form not rewritten:\n$plan")
    val got = df.as[(Long, Long)].collect().toSet
    assert(got == brute(1).filter { case (x, y) => x < y })
  }
}
