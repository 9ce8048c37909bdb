package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.ops.Similarity

/** Native codegen'd expressions vs their interpreted HOF twins: the two
  * formulations must be BIT-IDENTICAL on every shape (the oracle hash gate
  * depends on swapping one for the other being invisible).
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def hofAgree(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, e) => acc + e)

  test("graft_sig_agree equals the interpreted zip_with form on all edge shapes") {
    GraftFunctions.register(spark)
    val rows = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 4L)),          // partial agreement
      (Seq(1L, 2L), Seq(1L, 2L)),                          // full agreement
      (Seq.empty[Long], Seq(1L, 2L)),                      // empty side
      (Seq(5L, 6L, 7L), Seq(5L, 6L)),                      // length mismatch: tail ignored
      (Seq(0L, -1L, Long.MaxValue), Seq(0L, -1L, Long.MaxValue))
    ).toDF("a", "b")
    val both = rows.select(
      call_function("graft_sig_agree", col("a"), col("b")).as("native"),
      hofAgree(col("a"), col("b")).as("hof")).collect()
    both.foreach(r => assert(r.getInt(0) == r.getInt(1), s"mismatch: $r"))
    assert(both.map(_.getInt(0)).toSeq == Seq(3, 2, 0, 2, 3))
  }

  test("graft_sig_agree null elements contribute 0, like the HOF form") {
    GraftFunctions.register(spark)
    val rows = Seq(
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, null, 3L))
    ).toDF("a", "b")
    val r = rows.select(
      call_function("graft_sig_agree", col("a"), col("b")).as("native"),
      hofAgree(col("a"), col("b")).as("hof")).collect().head
    assert(r.getInt(0) == 2 && r.getInt(1) == 2, s"null==null must NOT count: $r")
  }

  test("graft_dot equals the interpreted HOF fallback bit-for-bit on equal lengths") {
    GraftFunctions.register(spark)
    val rows = Seq(
      (Seq(0.5f, -1.25f, 2.0f), Seq(4.0f, 0.5f, -0.125f)),
      (Seq.empty[Float], Seq.empty[Float])
    ).toDF("a", "b")
    val both = rows.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof")).collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"bit mismatch: $r")
    }
    // mismatched lengths: the native expression's shorter-prefix contract
    // (zip_with would pad with nulls and annihilate the HOF sum — vectors
    // in every registered plan are equal-length, so the forms agree there)
    val prefix = Seq((Seq(1.5f, 2.5f), Seq(3.0f))).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b"))).collect().head.getDouble(0)
    assert(prefix == 4.5)
  }

  test("graft_sig_agree type check rejects non-integral and mixed element types") {
    GraftFunctions.register(spark)
    val bad = Seq((Seq(1.0, 2.0), Seq(1L, 2L))).toDF("a", "b")
    val ex = intercept[Exception] {
      bad.select(call_function("graft_sig_agree", col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("graft_sig_agree"))
  }

  test("graft_simhash packs per-word sign votes exactly like the aggregate formula") {
    GraftFunctions.register(spark)
    // tokens' (w0, w1) words flattened; votes per bit of each 32-bit word
    val toks = Seq((5L, 0xF0F0F0F0L), (7L, 0xF0F0F0F0L), (5L, 0x0L))
    val flat = toks.flatMap { case (a, b) => Seq(a, b) }
    val packs = Seq(Tuple1(flat)).toDF("xs")
      .select(call_function("graft_simhash", col("xs"), lit(2)))
      .collect().head.getSeq[Long](0)
    def expectedWord(vals: Seq[Long]): Long =
      (0 until 32).map { b =>
        val votes = vals.map(v => if (((v >> b) & 1L) == 1L) 1 else -1).sum
        if (votes >= 0) 1L << b else 0L
      }.sum
    assert(packs == Seq(expectedWord(toks.map(_._1)), expectedWord(toks.map(_._2))))
    // a flat array not divisible by nWords is a loud error, never a wrong hash
    val ex = intercept[Exception] {
      Seq(Tuple1(Seq(1L, 2L, 3L))).toDF("xs")
        .select(call_function("graft_simhash", col("xs"), lit(2))).collect()
    }
    assert(ex.getMessage.contains("graft_simhash") || ex.getMessage.contains("multiple"))
  }

  test("graft_minhash_sig equals the affine-min-per-permutation formula exactly") {
    GraftFunctions.register(spark)
    val xs = Seq(5L, 99L, 123456L, 2147483646L, 0L)
    val sig = Seq(Tuple1(xs)).toDF("xs")
      .select(call_function("graft_minhash_sig", col("xs"), lit(64)))
      .collect().head.getSeq[Long](0)
    val expected = (0 until 64).map { i =>
      val (a, b) = graft.ops.Dedup.minhashPerm(i)
      xs.map(x => (a * x + b) % graft.ops.Dedup.MinhashP).min
    }
    assert(sig == expected)
    // empty array: components are p-1 sentinels (no shingle evidence)
    val empty = Seq(Tuple1(Seq.empty[Long])).toDF("xs")
      .select(call_function("graft_minhash_sig", col("xs"), lit(8)))
      .collect().head.getSeq[Long](0)
    assert(empty == Seq.fill(8)(graft.ops.Dedup.MinhashP - 1))
    // type check rejects non-long arrays
    val ex = intercept[Exception] {
      Seq(Tuple1(Seq(1.0))).toDF("xs")
        .select(call_function("graft_minhash_sig", col("xs"), lit(4))).collect()
    }
    assert(ex.getMessage.contains("graft_minhash_sig"))
  }
}
