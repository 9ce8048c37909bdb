package graft

import graft.ops.Fuzzy
import org.apache.spark.sql.functions._

/** The deletion-banded edit-distance join must equal a driver-side brute
  * force exactly (recall 1 by the pigeonhole property, precision 1 by the
  * levenshtein verify), and the key generator must match a plain-Scala
  * reference on every length class including the degenerate ones.
  */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def refDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("X2f deletion keys match the reference neighborhood on all length classes") {
    val words = Seq("", "a", "ab", "aba", "spark", "aaaa").toDF("w")
    val out = words.select(col("w"), Fuzzy.deletionKeys(col("w")).as("k"))
      .as[(String, Seq[String])].collect().toMap
    words.as[String].collect().foreach { w =>
      val expect = (w +: w.indices.map(i => w.take(i) + w.drop(i + 1))).distinct
      assert(out(w).sorted == expect.sorted, s"keys of '$w': ${out(w)} != $expect")
    }
  }

  test("X2f banded pairs equal driver brute force; distance-2 pairs never leak in") {
    // mixed shapes: substitutions, inserts, deletes, repeats, far words,
    // and an exact duplicate (distance 0 is a legitimate pair)
    val words = Seq("spark", "spork", "sprk", "sparkk", "spark", "scala",
      "scale", "shale", "whale", "nothing", "alike", "al", "a", "b", "ab")
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val df = words.toDF("id", "w")
    val got = Fuzzy.editNeighborPairs(df, "id", col("w"))
      .as[(Long, Long, Long)].collect().toSet
    val expect = (for {
      (ia, wa) <- words; (ib, wb) <- words if ia < ib
      d = refDist(wa, wb) if d <= 1
    } yield (ia, ib, d.toLong)).toSet
    assert(got == expect, s"banded ${got.size} vs brute ${expect.size}:\n" +
      s"missing=${expect -- got}\nextra=${got -- expect}")
    assert(expect.exists(_._3 == 0L) && expect.exists(_._3 == 1L),
      "fixture exercises both distance classes")
  }
}
