package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: how much exchange volume does the PLANNER-injected Bloom
  * runtime filter ([[graft.plans.SketchJoinPlanning]] pass 3) remove on
  * the q14 shape — a shuffle join of orders against a hot-customer dim
  * whose key set covers ~11% of the probe's custkeys — when the decision
  * comes from the STORED artifacts alone (no hints, no hand-placed
  * [[graft.ops.BloomPrune]] call)?
  *
  * Observables per leg: wall time and total shuffle WRITE bytes
  * (SparkListener task metrics). Run legs in separate invocations when
  * comparing wall times (shared-JVM warmup favors the second leg).
  *
  * Usage: runMain graft.tools.RuntimeFilterProbe <sfDir> [planned|plain|both]
  */
object RuntimeFilterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = if (args.length > 1) args(1) else "both"
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.SketchCatalog
    // pin the shuffle regime the pass targets: Catalyst broadcast off,
    // pass-2 artifact broadcast off — any delta is pass 3's alone
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(SketchCatalog.BroadcastBytesKey, "0")

    val shuffleW = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) shuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    val tmp = java.nio.file.Files.createTempDirectory("graft-rfprobe").toString
    val hotPath = s"$tmp/hot_customer"
    spark.read.parquet(s"$dir/customer.parquet")
      .where(col("c_nationkey") < 3)
      .write.mode("overwrite").parquet(hotPath)
    val catPath = s"$tmp/catalog"
    SketchCatalog.save(
      SketchCatalog.harvest(spark, s"$dir/orders.parquet", Seq("o_custkey"))
        .unionByName(SketchCatalog.harvest(spark, hotPath, Seq("c_custkey"))),
      catPath)

    def chain() = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(hotPath), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))

    def time(label: String, f: => Long): Unit = {
      shuffleW.set(0L)
      val t0 = System.nanoTime()
      val cnt = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000L)
      println(f"$label rows=$cnt time=$secs%.2f s " +
        f"shuffleWrite=${shuffleW.get / (1024.0 * 1024)}%.1f MiB")
    }

    if (mode != "plain") {
      SketchCatalog.activate(spark, catPath)
      time("planned", chain().collect().length.toLong)
      SketchCatalog.deactivate(spark)
    }
    if (mode != "planned")
      time("plain  ", chain().collect().length.toLong)
    spark.stop()
  }
}
