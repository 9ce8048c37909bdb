package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale probe for the data-quality profile pair (SCALING.md): times
  * [[graft.ops.DataQuality.profile]] (exact multi-distinct — the (k+1)-
  * replica expand) against [[graft.ops.DataQuality.profileApprox]] (HLL++
  * sketch, no expand) on the same fixture, so the crossover where the
  * expand stops being affordable is a measured number, not an argument.
  *
  * Usage: runMain graft.tools.DqProbe <sfDir> [reps]
  * Prints one JSON line {"fixture":…,"exact_s":…,"approx_s":…} (min of reps).
  */
object DqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    orders.cache().count() // scan off the clock: measure the agg, not IO
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    def time(f: => Unit): Double = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }
    val exact = time(graft.ops.DataQuality.profile(orders, cols)
      .write.format("noop").mode("overwrite").save())
    val approx = time(graft.ops.DataQuality.profileApprox(orders, cols, rsd = 0.01)
      .write.format("noop").mode("overwrite").save())
    println(f"""{"fixture":"$dir","rows":${orders.count()},"exact_s":$exact%.3f,"approx_s":$approx%.3f}""")
    spark.stop()
  }
}
