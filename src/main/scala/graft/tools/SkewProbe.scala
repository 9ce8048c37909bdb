package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: what does the PLANNER-injected salted join
  * ([[graft.plans.SketchJoinPlanning]] pass 4) buy on the q18 shape — a
  * shuffle join of a fact whose top key holds ~33% of its rows — when the
  * decision comes from the STORED heavy-key artifacts alone?
  *
  * The observable that matters for skew is the STRAGGLER, not the total:
  * per-leg this prints wall time, the MAX single-task duration and the
  * MAX single-task shuffle-read bytes (SparkListener task metrics) — an
  * unsalted skewed join funnels the hot key's rows through one reducer
  * (max-task ≈ wall at cluster widths), the salted plan spreads them
  * across the bucket count. Run legs in separate invocations when
  * comparing wall times (shared-JVM warmup favors the second leg).
  *
  * Usage: runMain graft.tools.SkewProbe <sfDir> [salted|plain|both]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = if (args.length > 1) args(1) else "both"
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.SketchCatalog
    // pin the shuffle regime the pass targets: both broadcast paths off —
    // any delta is pass 4's alone
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(SketchCatalog.BroadcastBytesKey, "0")

    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val maxReadB = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          maxTaskMs.getAndAccumulate(m.executorRunTime, math.max)
          val read = m.shuffleReadMetrics.totalBytesRead
          maxReadB.getAndAccumulate(read, math.max)
        }
      }
    })

    val tmp = java.nio.file.Files.createTempDirectory("graft-skewprobe").toString
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val factPath = s"$tmp/fact"
    ev.select(
        when(col("event_id") % 3 === 0, 7L)
          .otherwise(col("user_id") + 1000L).as("key"),
        col("value").as("val"), col("event_id"))
      .write.mode("overwrite").parquet(factPath)
    val dimPath = s"$tmp/dim"
    spark.read.parquet(factPath).select(col("key")).distinct()
      .select(col("key").as("m_key"), (col("key") % 5).as("grp"))
      .coalesce(1).write.mode("overwrite").parquet(dimPath)
    val catPath = s"$tmp/catalog"
    SketchCatalog.save(
      SketchCatalog.harvest(spark, factPath, Seq("key"))
        .unionByName(SketchCatalog.harvest(spark, dimPath, Seq("m_key"))),
      catPath)

    def chain() = spark.read.parquet(factPath)
      .join(spark.read.parquet(dimPath), col("key") === col("m_key"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(col("val").cast("decimal(18,6)")).as("s"))

    def time(label: String, f: => Long): Unit = {
      maxTaskMs.set(0L); maxReadB.set(0L)
      val t0 = System.nanoTime()
      val cnt = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000L)
      println(f"$label rows=$cnt wall=$secs%.2f s " +
        f"maxTask=${maxTaskMs.get / 1000.0}%.2f s " +
        f"maxTaskShuffleRead=${maxReadB.get / (1024.0 * 1024)}%.1f MiB")
    }

    if (mode != "plain") {
      SketchCatalog.activate(spark, catPath)
      time("salted", chain().collect().length.toLong)
      SketchCatalog.deactivate(spark)
    }
    if (mode != "salted")
      time("plain ", chain().collect().length.toLong)
    spark.stop()
  }
}
