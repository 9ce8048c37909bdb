package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: how much exchange volume does
  * [[graft.ops.BloomPrune.prunedEquiJoin]] actually remove on the
  * canonical selective-join shape, vs the plain shuffle join on the same
  * data?
  *
  * Fixture: the ScaleUp lineitem ⋈ selective supplier subset exactly as
  * registered (`q12_bloom_revenue`). Observables per leg: wall time and
  * total shuffle WRITE bytes (SparkListener task metrics) — the pruned
  * plan's claim is that only `matches + fpp·non-matches` fact rows reach
  * the exchange. Run each leg in its own invocation when comparing wall
  * times (shared-JVM warmup favors the second leg).
  *
  * Usage: runMain graft.tools.BloomPruneProbe <sfDir> [pruned|plain|both]
  */
object BloomPruneProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = if (args.length > 1) args(1) else "both"
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // isolate the measured exchanges: no auto-broadcast of the dim side
    // (at 100 TB the dim subset is broadcastable, but then BOTH legs skip
    // the fact shuffle and the A/B measures nothing — force the
    // shuffle-join regime the technique exists for)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val shuffleW = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) shuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    val sup = spark.read.parquet(s"$dir/supplier.parquet")
      .where(col("s_acctbal") > 9000.0)
      .select(col("s_suppkey"), col("s_name"))

    def agg(j: org.apache.spark.sql.DataFrame) = j
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).as("revenue"), count(lit(1)).as("n_items"))

    def time(label: String, f: => Long): Unit = {
      shuffleW.set(0L)
      val t0 = System.nanoTime()
      val cnt = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000L)
      println(f"$label rows=$cnt time=$secs%.2f s " +
        f"shuffleWrite=${shuffleW.get / (1024.0 * 1024)}%.1f MiB")
    }

    if (mode != "plain")
      time("pruned", agg(graft.ops.BloomPrune.prunedEquiJoin(
        li, sup, col("l_suppkey"), col("s_suppkey"),
        expectedItems = 1000000L, fpp = 0.01)).collect().length.toLong)
    if (mode != "pruned")
      time("plain ", agg(li.join(sup, col("l_suppkey") === col("s_suppkey")))
        .collect().length.toLong)
    spark.stop()
  }
}
