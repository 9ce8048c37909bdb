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

  test("X10ma approx form: sketch is exact under the accuracy budget, " +
    "rank contract holds on gappy groups where value distance would not") {
    val rows =
      (1 to 20).map(i => ("clean", 10.0 + (i % 5) * 0.1)) ++
      ((1 to 20).map(i => ("spiky", 5.0 + (i % 5) * 0.1)) :+ (("spiky", 500.0))) ++
      // the gap group: n=2, values {0, 100} — the exact interpolated med is
      // 50, which NO data value approaches; approx_percentile returns a
      // data value, so any value-distance contract would flake here while
      // the rank-window contract passes by the sketch's own guarantee
      Seq(("gap", 0.0), ("gap", 100.0))
    val df = rows.toDF("g", "v")
    val approx = Anomaly.madOutlierReportApprox(df, "g", "v")
      .as[(String, Long, Double, Double, Long)].collect().map(r => r._1 -> r).toMap
    // groups are far under the sketch budget (accuracy 10000): GK stores
    // every value, so med/mad/n_outliers match the exact report on the
    // non-interpolating groups (odd-n medians land on data values)
    assert(approx("spiky")._5 == 1L, s"spike must survive the sketch: ${approx("spiky")}")
    // the gap group's approx med is one of the two DATA values, not 50
    assert(approx("gap")._3 == 0.0 || approx("gap")._3 == 100.0, approx("gap").toString)
    // the registered gate's rank-window check, replayed here: rank of the
    // estimate within [45%, 55%] of n (count-below <= .55n, count-at-or-
    // below >= .45n) — true for EITHER returned value at n=2
    for ((g, est) <- Seq(("gap", approx("gap")._3), ("clean", approx("clean")._3))) {
      val vs = rows.filter(_._1 == g).map(_._2)
      val lt = vs.count(_ < est).toLong; val le = vs.count(_ <= est).toLong
      assert(lt * 100 <= vs.size * 55 && le * 100 >= vs.size * 45,
        s"$g: estimate $est violates the rank window (lt=$lt le=$le n=${vs.size})")
    }
  }
}
