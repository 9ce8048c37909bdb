package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Salted and hot/cold joins must be result-identical to the plain join. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val large = (1 to 1000).map { i =>
    // heavily skewed: 80% of rows share key 1
    val k = if (i % 5 != 0) 1 else i % 50
    (i.toLong, k, s"v$i")
  }.toDF("row_id", "k", "payload")

  private lazy val small = (0 until 50).map(k => (k, s"dim$k")).toDF("k", "dim")

  test("saltedJoin matches the plain join exactly") {
    val plain = large.join(small, Seq("k")).select("row_id", "k", "payload", "dim")
      .as[(Long, Int, String, String)].collect().sortBy(_._1).toSeq
    val salted = Skew.saltedJoin(large, small, "k", buckets = 8)
      .select("row_id", "k", "payload", "dim")
      .as[(Long, Int, String, String)].collect().sortBy(_._1).toSeq
    assert(salted == plain)
  }

  test("saltedJoin left join keeps unmatched rows once") {
    val smallMissing = small.where($"k" =!= 1) // drop the hot key's dim row
    val out = Skew.saltedJoin(large, smallMissing, "k", buckets = 4, joinType = "left")
    assert(out.count() == 1000)
    assert(out.where($"k" === 1).where($"dim".isNull).count() === large.where($"k" === 1).count())
  }

  test("hotColdJoin matches the plain join; histogram finds the hot key") {
    val hist = Skew.keyHistogram(large, "k", topN = 1).as[(Int, Long)].head()
    assert(hist._1 == 1 && hist._2 == 800)
    val plain = large.join(small, Seq("k")).count()
    assert(Skew.hotColdJoin(large, small, "k", hotKeys = Seq(1)).count() == plain)
  }
}
