package graft

import graft.ops.Anomaly

/** The MAD outlier rule must flag planted spikes, stay silent on clean
  * groups, and go loud (every v ≠ med) on frozen-metric groups (mad 0).
  */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  test("X10m planted spike flagged; clean group silent; mad=0 goes loud") {
    val rows =
      (1 to 20).map(i => ("clean", 10.0 + (i % 5) * 0.1)) ++            // tight cluster
      ((1 to 20).map(i => ("spiky", 5.0 + (i % 5) * 0.1)) :+ (("spiky", 500.0))) ++
      (1 to 9).map(_ => ("frozen", 7.0)) ++ Seq(("frozen", 7.1))        // mad = 0
    val out = Anomaly.madOutlierReport(rows.toDF("g", "v"), "g", "v")
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("clean")._5 == 0L, s"clean group flagged: ${out("clean")}")
    assert(out("spiky")._5 == 1L, s"exactly the planted spike: ${out("spiky")}")
    assert(out("frozen")._4 == 0.0 && out("frozen")._5 == 1L,
      s"mad=0 must flag every v != med: ${out("frozen")}")
    assert(out.values.forall(r => r._2 > 0 && !r._3.isNaN && !r._4.isNaN))
  }
}
