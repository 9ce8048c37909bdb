package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev probe: the grouped top-k A/B — `row_number()` window idiom vs
  * the native bounded aggregate ([[graft.functions.TopKAgg]]) on the
  * registered `x7_topk_agg` shape. The window form must shuffle EVERY
  * row of a group to one task and sort it; the aggregate ships at most
  * k rows per (map partition, group). Observables: wall and total
  * shuffle-write bytes per leg.
  *
  * Usage: runMain graft.tools.TopKProbe <sfDir> [k]
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val shuffleW = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) shuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))

    def time(label: String)(f: => Long): Unit = {
      shuffleW.set(0L)
      val t0 = System.nanoTime()
      val n = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500L)
      println(f"$label rows=$n time=$secs%.2f s " +
        f"shuffleWrite=${shuffleW.get / (1024.0 * 1024)}%.1f MiB")
    }

    println(s"orders rows = ${orders.count()}")
    time("listener-sanity (explicit repartition)") {
      orders.repartition(64, col("o_orderkey")).count()
    }
    time("topk-agg") {
      orders.groupBy("o_orderpriority")
        .agg(call_function("graft_topk",
          struct(col("o_totalprice"), col("o_orderkey")), lit(k)).as("t"))
        .select(col("o_orderpriority"), explode(col("t")))
        .count()
    }
    val win = orders.withColumn("rank", row_number().over(
        Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .where(col("rank") <= k)
    time("window  ") { win.count() }
    println("window plan contains WindowGroupLimit: " +
      win.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    spark.stop()
  }
}
