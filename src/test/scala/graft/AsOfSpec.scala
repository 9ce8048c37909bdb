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

  test("as-of join plan has no join node — one exchange, one window") {
    val out = AsOf.asofJoin(left, right, "k", col("lts"), col("rts"), col("rid"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
    assert(plan.contains("Window"), s"expected a window in:\n$plan")
  }
}
