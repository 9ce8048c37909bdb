package graft

import graft.ops.Privacy
import org.apache.spark.sql.functions._

/** k-anonymity semantics pinned: boundary classes (size exactly k kept),
  * NULL quasi values forming their own class, suppression nulling every
  * quasi column, and audit/suppression agreement.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // 3 classes: ("a",1) x 10 (kept at k=10), ("b",2) x 9 (suppressed),
  // (null,3) x 10 (kept — NULLs group as a class)
  private def fixture = {
    val rows =
      (1 to 10).map(i => (i, Option("a"), Option(1))) ++
      (11 to 19).map(i => (i, Option("b"), Option(2))) ++
      (20 to 29).map(i => (i, Option.empty[String], Option(3)))
    rows.toDF("id", "q1", "q2")
  }

  test("X5k boundary class kept at exactly k; small class fully nulled; NULL class groups") {
    val out = Privacy.suppressBelowK(fixture, Seq("q1", "q2"), k = 10)
      .orderBy("id").collect()
    assert(out.length == 29)
    val kept = out.filter(r => r.getInt(0) <= 10)
    assert(kept.forall(r => !r.getBoolean(4) && r.getString(1) == "a" && r.getLong(3) == 10))
    val small = out.filter(r => r.getInt(0) >= 11 && r.getInt(0) <= 19)
    assert(small.forall(r => r.getBoolean(4) && r.isNullAt(1) && r.isNullAt(2) && r.getLong(3) == 9))
    val nullClass = out.filter(r => r.getInt(0) >= 20)
    assert(nullClass.forall(r => !r.getBoolean(4) && r.isNullAt(1) && r.getInt(2) == 3 && r.getLong(3) == 10),
      "NULL quasi values must form their own class of size 10 and survive")
  }

  test("X5k audit agrees with suppression") {
    val audit = Privacy.kAnonymityAudit(fixture, Seq("q1", "q2"), k = 10)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(audit == ((29L, 3L, 1L, 9L, 9L)), audit.toString)
    val suppressed = Privacy.suppressBelowK(fixture, Seq("q1", "q2"), k = 10)
      .where(col("suppressed")).count()
    assert(suppressed == audit._4)
  }
}
