package graft

import graft.ops.SetJoin
import org.apache.spark.sql.functions._

/** The prefix-filtered exact Jaccard join must equal driver-side brute
  * force on arbitrary token sets (recall 1 by the prefix lemma, precision
  * 1 by the integer verify), at several thresholds including t = 1
  * (equality of sets) and the short-set edge cases.
  */
class SetJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sets: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("a", "b", "c", "d"),
    2L -> Seq("a", "b", "c", "e"),      // J(1,2) = 3/5
    3L -> Seq("a", "b", "c", "d"),      // J(1,3) = 1 (identical)
    4L -> Seq("x", "y"),
    5L -> Seq("x", "y", "z"),           // J(4,5) = 2/3
    6L -> Seq("q"),                     // singleton
    7L -> Seq("q"),                     // J(6,7) = 1
    8L -> Seq("m", "n", "o", "p", "r", "s", "t", "u"),
    9L -> Seq("m", "n", "o", "p", "r", "s", "t", "v") // J(8,9) = 7/9
  )

  private def brute(tNum: Int, tDen: Int): Set[(Long, Long, Long, Long)] = (for {
    (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
    inter = (sa.toSet & sb.toSet).size.toLong
    uni = (sa.toSet | sb.toSet).size.toLong
    if inter * tDen >= uni * tNum
  } yield (ia, ib, inter, uni)).toSet

  test("X2ap banded join equals brute force at several rational thresholds") {
    val df = sets.toDF("id", "toks")
    for ((n, d) <- Seq((1, 2), (2, 3), (4, 5), (1, 1))) {
      val got = SetJoin.jaccardJoin(df, "id", col("toks"), n, d)
        .as[(Long, Long, Long, Long)].collect().toSet
      graft.ops.OpCaches.release()
      assert(got == brute(n, d), s"t=$n/$d: missing=${brute(n, d) -- got} extra=${got -- brute(n, d)}")
    }
    // t = 1 finds exactly the identical-set pairs
    assert(brute(1, 1) == Set((1L, 3L, 4L, 4L), (6L, 7L, 1L, 1L)))
  }

  test("X2ap heavy-token path: brute parity when every token is heavy, and on a mixed split") {
    val df = sets.toDF("id", "toks")
    // heavyOcc = 1: EVERY repeated token is heavy — all shared counts flow
    // through the prefix-candidate + heavy-count branch
    for ((n, d) <- Seq((1, 2), (1, 1))) {
      val got = SetJoin.jaccardJoin(df, "id", col("toks"), n, d, heavyOcc = 1)
        .as[(Long, Long, Long, Long)].collect().toSet
      graft.ops.OpCaches.release()
      assert(got == brute(n, d), s"heavyOcc=1 t=$n/$d: missing=${brute(n, d) -- got} extra=${got -- brute(n, d)}")
    }
    // heavyOcc = 2: tokens in >2 sets (a, b, c — and m,n,o,p,r,s,t in 2)
    // split across branches; inter must still be exact light + heavy
    for ((n, d) <- Seq((1, 2), (2, 3))) {
      val got = SetJoin.jaccardJoin(df, "id", col("toks"), n, d, heavyOcc = 2)
        .as[(Long, Long, Long, Long)].collect().toSet
      graft.ops.OpCaches.release()
      assert(got == brute(n, d), s"heavyOcc=2 t=$n/$d: missing=${brute(n, d) -- got} extra=${got -- brute(n, d)}")
    }
  }

  test("X2ap empty sets are excluded; empty input yields empty output") {
    val df = Seq((1L, Seq.empty[String]), (2L, Seq.empty[String]), (3L, Seq("a")))
      .toDF("id", "toks")
    val got = SetJoin.jaccardJoin(df, "id", col("toks"), 1, 2).count()
    graft.ops.OpCaches.release()
    assert(got == 0L, "no defined Jaccard pair exists")
  }
}
