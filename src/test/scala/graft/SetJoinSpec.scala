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

  /** Brute-force weighted pairs under the SAME micro-idf weights the
    * operator derives (round(1e6·ln((D+1)/(df+1)))).
    */
  private def bruteWeighted(tNum: Int, tDen: Int): Set[(Long, Long, Long, Long)] = {
    val d = sets.size
    val dfreq = sets.flatMap(_._2.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size }
    def w(t: String): Long =
      math.round(math.log((d + 1.0) / (dfreq(t) + 1.0)) * 1e6)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      interW = (sa.toSet & sb.toSet).toSeq.map(w).sum
      uniW = (sa.toSet | sb.toSet).toSeq.map(w).sum
      if uniW > 0 && interW * tDen >= uniW * tNum
    } yield (ia, ib, interW, uniW)).toSet
  }

  test("X2wj weighted join equals weighted brute force, incl. forced heavy split") {
    val df = sets.toDF("id", "toks")
    for ((n, d) <- Seq((1, 2), (2, 3), (1, 1)); occ <- Seq(1024, 2, 1)) {
      val got = SetJoin.weightedJaccardJoin(df, "id", col("toks"), n, d, heavyOcc = occ)
        .as[(Long, Long, Long, Long)].collect().toSet
      graft.ops.OpCaches.release()
      assert(got == bruteWeighted(n, d),
        s"t=$n/$d occ=$occ: missing=${bruteWeighted(n, d) -- got} extra=${got -- bruteWeighted(n, d)}")
    }
  }

  test("X2ap/X2wj heavyProbe=false is fully lazy and result-identical") {
    val df = sets.toDF("id", "toks")
    // laziness: constructing the plan must run ZERO Spark jobs
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val lazyPlain = SetJoin.jaccardJoin(df, "id", col("toks"), 1, 2, heavyProbe = false)
    val lazyWeighted = SetJoin.weightedJaccardJoin(df, "id", col("toks"), 1, 2,
      heavyProbe = false)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, s"plan construction ran ${after - before} eager job(s)")
    // parity with the probing default
    assert(lazyPlain.as[(Long, Long, Long, Long)].collect().toSet == brute(1, 2))
    assert(lazyWeighted.as[(Long, Long, Long, Long)].collect().toSet == bruteWeighted(1, 2))
    graft.ops.OpCaches.release()
  }
}
