package graft

import graft.ops.Intervals
import org.apache.spark.sql.functions._

/** Interval-join semantics: exclusive start, inclusive end, bucket-boundary
  * pairs included, and equivalence with the naive theta-join on random data
  * (the binning must be invisible to results).
  */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("boundaries: (lts, lts + w] inclusive end, exclusive start, across buckets") {
    val l = Seq((1L, 1000L, 10L)).toDF("k", "pts", "pid")
    val r = Seq(
      (1L, 1000L, 20L), // == lts -> excluded (exclusive start)
      (1L, 1001L, 21L), // just inside
      (1L, 1100L, 22L), // inside, same bucket
      (1L, 1099L, 23L), // inside (w=100: 1000+100=1100 incl; 1099 is in next bucket 10)
      (1L, 1101L, 24L), // just past inclusive end -> excluded
      (2L, 1050L, 25L)  // wrong key
    ).toDF("k", "ets", "eid")
    val out = Intervals.windowJoin(l, r, "k", "pts", "ets", windowMs = 100L)
      .select("eid").as[Long].collect().toSet
    assert(out == Set(21L, 22L, 23L))
  }

  test("property: binned interval join equals the naive theta-join on random data") {
    def h(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .take(6).map("%02x".format(_)).mkString, 16)
    val w = 37L // deliberately not a divisor of anything
    val ls = (1 to 150).map(i => (h(s"k$i") % 5, h(s"lt$i") % 500, i.toLong))
    val rs = (1 to 250).map(i => (h(s"rk$i") % 5, h(s"rt$i") % 500, 1000L + i))
    val l = ls.toDF("k", "pts", "pid")
    val r = rs.toDF("k", "ets", "eid")

    val binned = Intervals.windowJoin(l, r, "k", "pts", "ets", windowMs = w)
      .select("pid", "eid").as[(Long, Long)].collect().toSet
    val naive = (for {
      (lk, lt, pid) <- ls
      (rk, rt, eid) <- rs
      if lk == rk && rt > lt && rt <= lt + w
    } yield (pid, eid)).toSet
    assert(binned == naive)
  }
}
