package graft

import graft.functions.JaroWinkler
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The native Jaro–Winkler must reproduce the DuckDB reference
  * implementation value-for-value (these constants are MEASURED from
  * `jaro_winkler_similarity` — textbook cases, the empty-string and
  * no-match conventions, the thresholded boost both sides of 0.7, and an
  * ODD transposition count that distinguishes integer from fractional
  * halving), and the codegen path must agree with interpreted eval.
  */
class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val reference: Seq[(String, String, Double)] = Seq(
    ("martha", "marhta", 0.9611111111111111),      // textbook transposition
    ("dixon", "dicksonx", 0.8133333333333332),     // textbook
    ("jellyfish", "smellyfish", 0.8962962962962964), // no shared prefix: jw = jaro
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("Customer#000001", "Customer#000002", 0.9733333333333334),
    ("abc", "abc", 1.0),
    ("x", "x", 1.0),
    ("abc", "xyz", 0.0),                           // no matches
    ("ab", "ba", 0.0),                             // window 0: no matches
    ("a", "", 0.0),                                // empty convention
    ("", "", 0.0),                                 // DuckDB: 0, not textbook 1
    ("abcdef", "abzzzz", 0.5555555555555555),      // jaro <= 0.7: NO boost
    ("aaaaaaaaaa", "aaaazzzzzzzzzz", 0.5619047619047619), // 4-prefix, still no boost
    ("xy", "xz", 0.6666666666666666),              // boundary-ish: below 0.7
    ("prefix_aaaa", "prefix_zzzz", 0.8545454545454545), // boosted, l capped at 4
    ("frog", "fog", 0.9249999999999999),           // full-precision repr: BIT equality
    ("abcdefgh", "bcadefgh", 0.9583333333333334))  // 3 mismatched matches: t = 3/2 = 1 (INTEGER)

  test("X2jw kernel equals the DuckDB reference value-for-value") {
    for ((a, b, want) <- reference) {
      val got = JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got == want, s"compute($a, $b) = $got, reference $want")
    }
  }

  test("X2jw codegen path agrees with the kernel; nulls propagate") {
    graft.functions.GraftFunctions.register(spark)
    val df = reference.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(col("a"), col("b"), call_function("graft_jaro_winkler", col("a"), col("b")).as("jw"))
    val got = df.as[(String, String, Double)].collect()
      .map { case (a, b, v) => (a, b) -> v }.toMap
    for ((a, b, want) <- reference)
      assert(got((a, b)) == want, s"sql($a, $b) = ${got((a, b))}, reference $want")
    val withNull = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(call_function("graft_jaro_winkler", col("a"), col("b")).as("jw"))
    assert(withNull.collect().head.isNullAt(0), "null input must yield null")
  }
}
