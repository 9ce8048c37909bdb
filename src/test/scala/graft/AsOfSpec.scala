package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._

/** As-of join semantics on hand-built frames: inclusive boundary, greatest-
  * tiebreak resolution on equal timestamps, null on no predecessor, and the
  * plan shape (one keyed window, zero join nodes).
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, 100L, 10L), // key 1: right rows at 90 and 100 -> inclusive pick at 100
    (1L, 95L, 11L),  // between right rows -> 90
    (2L, 50L, 20L),  // key 2: no right row at all -> null
    (3L, 5L, 30L)    // key 3: right row only later (ts 10) -> null
  ).toDF("k", "lts", "lid")

  private val right = Seq(
    (1L, 90L, 900L),
    (1L, 100L, 901L),
    (1L, 100L, 902L), // tied ts -> greatest tiebreak (902) wins
    (1L, 120L, 903L), // after every left row -> never matched
    (3L, 10L, 904L)
  ).toDF("k", "rts", "rid")

  test("as-of join: inclusive boundary, tie to greatest tiebreak, null when none precedes") {
    val out = AsOf.asofJoin(left, right, "k", col("lts"), col("rts"), col("rid"))
      .select(col("lid"), col("asof.rid").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(10L -> Some(902L), 11L -> Some(900L), 20L -> None, 30L -> None))
  }

  test("as-of within tolerance: stale matches null out, in-window matches survive, bound inclusive") {
    val out = AsOf.asofJoinWithin(left, right, "k", col("lts"), col("rts"), col("rid"),
        toleranceMs = 5L)
      .select(col("lid"), col("asof.rid").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    // lid 10: match at rts=100, lts=100, age 0 <= 5 -> kept (tie to 902)
    // lid 11: match at rts=90, lts=95, age 5 -> INCLUSIVE bound keeps it
    assert(out == Map(10L -> Some(902L), 11L -> Some(900L), 20L -> None, 30L -> None))
    val tight = AsOf.asofJoinWithin(left, right, "k", col("lts"), col("rts"), col("rid"),
        toleranceMs = 4L)
      .select(col("lid"), col("asof.rid").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    // age-5 match now stale -> null; age-0 match unaffected
    assert(tight == Map(10L -> Some(902L), 11L -> None, 20L -> None, 30L -> None))
    // tolerance 0: only exact-instant matches survive
    val zero = AsOf.asofJoinWithin(left, right, "k", col("lts"), col("rts"), col("rid"),
        toleranceMs = 0L)
      .select(col("lid"), col("asof.rid").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(zero == Map(10L -> Some(902L), 11L -> None, 20L -> None, 30L -> None))
  }

  test("NULL keys and NULL right timestamps never match (SQL join semantics)") {
    val l = Seq((Option(1L), 100L, 10L), (Option.empty[Long], 100L, 11L))
      .toDF("k", "lts", "lid")
    val r = Seq(
      (Option.empty[Long], Option(90L), 900L), // NULL key: matches nothing
      (Option(1L), Option.empty[Long], 901L),  // NULL ts: precedes nothing
      (Option(1L), Option(95L), 902L)          // the only legitimate match
    ).toDF("k", "rts", "rid")
    val out = AsOf.asofJoin(l, r, "k", col("lts"), col("rts"), col("rid"))
      .select(col("lid"), col("asof.rid").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    // NULL-keyed left row gets no match; NULL-keyed / NULL-ts right rows
    // are never attributed to anyone
    assert(out == Map(10L -> Some(902L), 11L -> None))
  }

  test("property: union-window as-of equals the naive theta-join argmax on random data") {
    // deterministic pseudo-random fixture (no RNG: md5-derived values)
    def h(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .take(6).map("%02x".format(_)).mkString, 16)
    val ls = (1 to 200).map(i => (h(s"lk$i") % 7, h(s"lt$i") % 100, i.toLong))
    val rs = (1 to 300).map(i => (h(s"rk$i") % 7, h(s"rt$i") % 100, 1000L + i))
    val l = ls.toDF("k", "lts", "lid")
    val r = rs.toDF("k", "rts", "rid")

    val fast = AsOf.asofJoin(l, r, "k", col("lts"), col("rts"), col("rid"))
      .select(col("lid"), col("asof.rid").as("rid"))
      .as[(Long, Option[Long])].collect().toMap

    // reference semantics, computed directly on the driver
    val byKey = rs.groupBy(_._1)
    val naive = ls.map { case (k, lts, lid) =>
      val best = byKey.getOrElse(k, Nil).filter(_._2 <= lts)
        .sortBy(t => (t._2, t._3)).lastOption.map(_._3)
      lid -> best
    }.toMap
    assert(fast == naive)
  }

  test("as-of join plan has no join node — one exchange, one window") {
    val out = AsOf.asofJoin(left, right, "k", col("lts"), col("rts"), col("rid"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
    assert(plan.contains("Window"), s"expected a window in:\n$plan")
  }
}
