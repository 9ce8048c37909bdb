package graft

import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** The HLL sketch store's load-bearing property is MERGEABILITY: unioning
  * per-group sketches of any partition of the data must give the same
  * estimate as one sketch over the whole (register merge is per-register
  * max — order- and grouping-insensitive), and the estimate must honor
  * the sketch's error contract on a cardinality far above the register
  * count.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("X10hll union of per-group sketches == one-shot sketch; 5% contract at 100k distinct") {
    val n = 300000L
    // 100k distinct keys, each seen ~3 times, spread over 16 groups
    val df = spark.range(n).select(
      (col("id") % 16).as("g"),
      concat(lit("user_"), (col("id") % 100000).cast("string")).as("k"))
    val sketches = Sketches.hllGroupSketches(df, col("g"), col("k"))
    assert(sketches.count() == 16)
    val est = Sketches.hllUnionEstimate(sketches)
      .select(col("n_groups"), col("n_rows"), col("distinct_approx"))
      .as[(Long, Long, Long)].head()
    assert(est._1 == 16 && est._2 == n)
    assert(math.abs(est._3 - 100000L) <= 5000L,
      s"estimate ${est._3} outside 5% of 100000")
    // one-shot sketch over the ungrouped data: estimates must be EQUAL,
    // not merely close — the union reconstructs identical registers
    val oneShot = df.agg(
      hll_sketch_estimate(hll_sketch_agg(col("k"), lit(12))).as("d"))
      .as[Long].head()
    assert(est._3 == oneShot, s"union=${est._3} one-shot=$oneShot")
    // a DIFFERENT partitioning unions to the same estimate too
    val est2 = Sketches.hllUnionEstimate(
      Sketches.hllGroupSketches(
        spark.range(n).select((col("id") % 7).as("g"),
          concat(lit("user_"), (col("id") % 100000).cast("string")).as("k")),
        col("g"), col("k")))
      .select(col("distinct_approx")).as[Long].head()
    assert(est2 == oneShot, s"7-way union=$est2 one-shot=$oneShot")
  }
}
