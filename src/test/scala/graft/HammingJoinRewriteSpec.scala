package graft

import org.apache.spark.sql.functions._

/** The optimizer rewrite of naive Hamming theta-joins: results must equal
  * the unrewritten join bit-for-bit (including duplicate-row multiplicity
  * and extra conjuncts), and the optimized plan must contain NO
  * cartesian/nested-loop pairing.
  */
class HammingJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  // fingerprints with planted structure: pairs within small distances,
  // pairs far apart, plus values that collide on some chunks only
  private lazy val fps = Seq(
    (0L, 0x0000000000000000L), (1L, 0x0000000000000001L), // d(0,1)=1
    (2L, 0x0000000000000007L), // d(1,2)=2, d(0,2)=3
    (3L, 0x00000000000000FFL), // d(2,3)=5
    (4L, 0xFFFFFFFFFFFFFFFFL), // far from everything low
    (5L, 0xFFFFFFFFFFFFFF00L), // d(4,5)=8
    (6L, 0x0F0F0F0F0F0F0F0FL),
    (7L, 0x0F0F0F0F0F0F0F00L) // d(6,7)=4
  ).toDF("id", "h")

  private def brute(k: Int): Set[(Long, Long, Long, Long)] = {
    val rows = fps.as[(Long, Long)].collect()
    (for {
      (ia, ha) <- rows; (ib, hb) <- rows
      if java.lang.Long.bitCount(ha ^ hb) <= k && ia < ib
    } yield (ia, ha, ib, hb)).toSet
  }

  test("naive bit_count(xor) join is rewritten: same result, no cartesian pairing") {
    val a = fps.toDF("id_a", "ha")
    val b = fps.toDF("id_b", "hb")
    for (k <- Seq(0, 1, 3, 8)) {
      val joined = a.join(b,
        bit_count(a("ha").bitwiseXOR(b("hb"))) <= lit(k) && a("id_a") < b("id_b"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"k=$k: naive Hamming join was not rewritten:\n$plan")
      assert(plan.contains("Expand"), s"k=$k: banded expansion missing from plan")
      val got = joined.select("id_a", "ha", "id_b", "hb")
        .as[(Long, Long, Long, Long)].collect()
      assert(got.length == got.toSet.size, s"k=$k: rewrite duplicated pairs")
      assert(got.toSet == brute(k), s"k=$k: rewrite changed the result")
    }
  }

  test("multiplicity with duplicate input rows matches the theta-join exactly") {
    val a = fps.union(fps.limit(2)).toDF("id_a", "ha") // ids 0 and 1 twice
    val b = fps.toDF("id_b", "hb")
    val cond = bit_count(a("ha").bitwiseXOR(b("hb"))) <= lit(3)
    val got = a.join(b, cond).groupBy("id_a", "id_b").count()
      .as[(Long, Long, Long)].collect().toSet
    // every pair involving left ids 0/1 must appear TWICE (duplicated left
    // rows), everything else once — the naive join's exact multiplicity
    val base = (for {
      (ia, ha) <- fps.as[(Long, Long)].collect()
      (ib, hb) <- fps.as[(Long, Long)].collect()
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    val expect = base.map { case (ia, ib) => (ia, ib, if (ia <= 1L) 2L else 1L) }
    assert(got == expect)
  }

  test("out-of-scope joins are left untouched (large bound, non-literal bound, outer join)") {
    val a = fps.toDF("id_a", "ha")
    val b = fps.toDF("id_b", "hb")
    // bound 16 exceeds the banding cap -> stays a nested-loop join, still correct
    val wide = a.join(b, bit_count(a("ha").bitwiseXOR(b("hb"))) <= lit(20))
    assert(wide.queryExecution.executedPlan.toString().contains("BroadcastNestedLoopJoin"))
    assert(wide.count() == brute(20).size * 2 + fps.count()) // symmetric pairs + self-pairs
    // left-outer keeps its semantics (rewrite is inner-only)
    val outer = a.join(b, bit_count(a("ha").bitwiseXOR(b("hb"))) <= lit(1), "left")
    assert(outer.count() >= fps.count())
  }

  test("128-bit form (sum of per-word bit_counts) is rewritten with word-straddling chunks") {
    // pairs with planted 128-bit distances: (0,1)=1 in lo, (0,2)=5 in hi,
    // (3) far away; chunk boundaries at bands=8 are 16-bit and straddle
    // nothing, bands=6 gives 21/22-bit chunks straddling the word boundary
    val rows = Seq(
      (0L, 0x0123456789ABCDEFL, 0x0000000000000000L),
      (1L, 0x0123456789ABCDEFL, 0x0000000000000001L),
      (2L, 0x0123456789ABCDE0L, 0x0000000000000000L), // hi differs by 4 bits? 0xF^0x0 = 4 bits
      (3L, 0x7EDCBA9876543210L, 0xFFFFFFFFFFFFFFFFL)
    ).toDF("id", "hi", "lo")
    def brute128(k: Int): Set[(Long, Long)] = {
      val r = rows.as[(Long, Long, Long)].collect()
      (for {
        (ia, hia, loa) <- r; (ib, hib, lob) <- r
        d = java.lang.Long.bitCount(hia ^ hib) + java.lang.Long.bitCount(loa ^ lob)
        if d <= k && ia < ib
      } yield (ia, ib)).toSet
    }
    val a = rows.toDF("id_a", "hi_a", "lo_a")
    val b = rows.toDF("id_b", "hi_b", "lo_b")
    for (k <- Seq(1, 5, 7)) {
      val joined = a.join(b,
        (bit_count(a("hi_a").bitwiseXOR(b("hi_b"))) +
          bit_count(a("lo_a").bitwiseXOR(b("lo_b")))) <= lit(k) &&
          a("id_a") < b("id_b"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"k=$k: 128-bit Hamming join was not rewritten:\n$plan")
      assert(plan.contains("Expand"), s"k=$k: banded expansion missing")
      assert(joined.select("id_a", "id_b").as[(Long, Long)].collect().toSet == brute128(k),
        s"k=$k: 128-bit rewrite changed the result")
    }
  }

  test("SQL form is rewritten too (extension is session-wide, not API-bound)") {
    fps.createOrReplaceTempView("fp_sql")
    val out = spark.sql(
      """SELECT a.id AS id_a, b.id AS id_b
        |FROM fp_sql a JOIN fp_sql b
        |  ON bit_count(a.h ^ b.h) <= 3 AND a.id < b.id""".stripMargin)
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    assert(out.as[(Long, Long)].collect().toSet ==
      brute(3).map { case (ia, _, ib, _) => (ia, ib) })
  }
}
