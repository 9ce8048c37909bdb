package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: where does [[graft.ops.Anomaly.madOutlierReport]]'s exact
  * percentile stop scaling, and does the approx form hold flat?
  *
  * Fixture: G groups × V mostly-distinct double values per group (value =
  * id-derived, so the exact percentile's value-count map cannot collapse
  * duplicates). The exact form materializes EVERY group's full value set
  * in aggregation-buffer state — G·V boxed entries, twice (median pass +
  * MAD pass) — so its cost and memory grow linearly with per-group
  * volume. The approx form's GK sketch holds ≤ accuracy entries per
  * group whatever V is: G·10k entries at any scale.
  *
  * Runs both forms at V ×1/×10/×100 with G fixed, reporting wall time AND
  * two state observables (SparkListener over task metrics): total shuffle
  * WRITE bytes — the exact percentile's partial-aggregate state is the
  * full per-group value-count map and every byte of it crosses the
  * exchange, while the sketch ships ≤ accuracy entries per (group,
  * partition) — and max per-task peakExecutionMemory. The sandbox's
  * 128 GiB heap hides the exact form's growth from wall time, but a
  * production executor's few-GB task slice is exactly what the state
  * columns overrun.
  *
  * Usage: runMain graft.tools.AnomalyScaleProbe [groups] [vBase] [mode]
  * mode = exact | approx | both (default both). An executor OOM in local
  * mode is fatal to the JVM, so the exact leg (which IS expected to die
  * at scale under a production-sized heap) gets its own process: run
  * `approx` first for the full flat series, then `exact` until it falls
  * over.
  */
object AnomalyScaleProbe {
  def main(args: Array[String]): Unit = {
    val groups = if (args.nonEmpty) args(0).toInt else 256
    val vBase = if (args.length > 1) args(1).toLong else 40000L
    val mode = if (args.length > 2) args(2) else "both"
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val peak = new java.util.concurrent.atomic.AtomicLong(0L)
    val shuffleW = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          peak.getAndAccumulate(m.peakExecutionMemory, math.max)
          shuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    def fixture(v: Long) = spark.range(groups * v).select(
      (col("id") % groups).cast("string").as("g"),
      // mostly-distinct values with a planted per-group spike tail
      (col("id") * 0.001 + (col("id") % 1000) * 0.1).as("v"))

    // collect(), not count(): under count() Catalyst PRUNES the percentile
    // aggregates entirely (group existence needs no med/mad) and the probe
    // measures a plain distinct-ish scan — caught because shuffle write sat
    // at 0.4 MiB for the exact form at every scale
    def time(label: String, f: => Long): Unit = {
      peak.set(0L); shuffleW.set(0L)
      val t0 = System.nanoTime()
      val cnt = f
      val secs = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading
      Thread.sleep(2000L)
      println(f"$label rows=$cnt time=$secs%.2f s " +
        f"shuffleWrite=${shuffleW.get / (1024.0 * 1024)}%.1f MiB " +
        f"peakTaskMem=${peak.get / (1024.0 * 1024)}%.1f MiB")
    }

    time("warm", graft.ops.Anomaly.madOutlierReport(fixture(1000), "g", "v").collect().length.toLong)
    Seq(1L, 10L, 100L).foreach { s =>
      val v = vBase * s
      if (mode != "exact")
        time(f"approx x$s%-3d (G=$groups V=$v)",
          graft.ops.Anomaly.madOutlierReportApprox(fixture(v), "g", "v").collect().length.toLong)
      if (mode != "approx")
        time(f"exact  x$s%-3d (G=$groups V=$v)",
          graft.ops.Anomaly.madOutlierReport(fixture(v), "g", "v").collect().length.toLong)
    }
    spark.stop()
  }
}
