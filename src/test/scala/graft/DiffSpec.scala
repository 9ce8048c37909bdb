package graft

import graft.ops.Diff
import org.apache.spark.sql.functions._

/** Snapshot reconciliation semantics: status assignment per key, null-safe
  * change detection (NULL↔value transitions are CHANGES, NULL↔NULL is
  * not), and the degenerate key-only schema.
  */
class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("X10d statuses: added/removed/changed/unchanged incl. NULL transitions") {
    val a = Seq[(Long, java.lang.Double, String)](
      (1L, 10.0, "x"), (2L, 20.0, "y"), (3L, null, "z"), (4L, 40.0, null), (5L, 50.0, "k")
    ).toDF("id", "v", "s")
    val b = Seq[(Long, java.lang.Double, String)](
      (1L, 10.0, "x"),     // unchanged
      (2L, 21.0, "y"),     // changed (value)
      (3L, 3.0, "z"),      // changed (NULL -> value)
      (4L, 40.0, null),    // unchanged (NULL <=> NULL)
      (6L, 60.0, "new")    // added; 5 removed
    ).toDF("id", "v", "s")
    val got = Diff.snapshotDiff(a, b, "id")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "unchanged", 5L -> "removed", 6L -> "added"), got.toString)
    val summary = Diff.diffSummary(a, b, "id").as[(String, Long)].collect().toSeq
    assert(summary == Seq(("added", 1L), ("changed", 2L), ("removed", 1L),
      ("unchanged", 2L)), summary.toString)
  }

  test("X10d identical snapshots are all unchanged; key-only schema compares as unchanged") {
    val a = Seq((1L, "p"), (2L, "q")).toDF("id", "v")
    assert(Diff.diffSummary(a, a, "id").as[(String, Long)].collect().toSeq ==
      Seq(("unchanged", 2L)))
    val k1 = Seq(1L, 2L).toDF("id")
    val k2 = Seq(2L, 3L).toDF("id")
    val got = Diff.snapshotDiff(k1, k2, "id").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "added"), got.toString)
  }
}
