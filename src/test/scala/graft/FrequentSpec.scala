package graft

import graft.ops.Frequent
import org.apache.spark.sql.functions._

/** Two-pass Misra–Gries: the output must equal brute-force exact heavy
  * hitters on adversarial distributions (boundary frequencies, the
  * all-distinct worst case, skew), and the fold must respect its size
  * bound and the undercount guarantee.
  */
class FrequentSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[String], k: Int): Map[String, Long] = {
    val n = rows.size
    rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }.toMap
  }

  test("X6hh heavy hitters equal brute force on boundary/skew/distinct shapes") {
    val shapes: Seq[(String, Seq[String], Int)] = Seq(
      // exactly-at-threshold key must be EXCLUDED (strict >), one-above kept
      ("boundary", Seq.fill(10)("at") ++ Seq.fill(11)("above") ++
        (1 to 79).map("t" + _), 10),  // n=100: 'at'*10 excluded, 'above'*11 kept
      ("skew", Seq.fill(500)("whale") ++ (1 to 300).map("u" + _), 4),
      ("alldistinct", (1 to 200).map("d" + _), 5),
      ("twoheavy", Seq.fill(40)("a") ++ Seq.fill(35)("b") ++ (1 to 25).map("x" + _), 3)
    )
    shapes.foreach { case (name, rows, k) =>
      val df = rows.toDF("w").repartition(7) // force multi-partition merge
      val got = Frequent.heavyHitters(df, col("w"), k)
        .as[(String, Long)].collect().toMap
      graft.ops.OpCaches.release()
      assert(got == brute(rows, k), s"$name: $got != ${brute(rows, k)}")
    }
  }

  test("X6hh fold holds <= size-1 counters and never undercounts by more than n/size") {
    val rows = (1 to 1000).map(i => ("k" + (i % 37), 1L))
    val m = Frequent.mgFold(rows.iterator, 8)
    assert(m.size <= 7, s"summary overflow: ${m.size}")
    val truth = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    m.foreach { case (key, est) =>
      assert(est <= truth(key), s"$key overestimated: $est > ${truth(key)}")
      assert(truth(key) - est <= 1000 / 8, s"$key undercount beyond n/k")
    }
  }
}
