package graft.tools

import graft.ops.DataSkipping
import graft.streaming.StreamingZorder
import org.apache.spark.sql.functions._

/** Dev probe: does the Hilbert generation keep its boundary-file edge over
  * Morton AT THE STREAMING CADENCE — i.e. across multiple incremental
  * OPTIMIZE rewrites, each folding a hot tail into the previous
  * generation — or does repeated re-clustering wash the curves together?
  * (The batch one-shot comparison lives in SkipProbe; this is the
  * [[graft.streaming.StreamingZorder]] path.)
  *
  * Usage: runMain graft.tools.ZorderStreamProbe <sfDir> [numFiles]
  */
object ZorderStreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val numFiles = if (args.length > 1) args(1).toInt else 128
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = spark.read.parquet(s"$dir/events.parquet")
    val et = graft.functions.EventTime.bind(ev)
    val base = ev.select(col("event_id"), col("user_id"), et.ms.as("ts_ms"))
    val b = base.agg(min("user_id"), max("user_id"), min("ts_ms"), max("ts_ms")).head()
    val (umin, umax, tmin, tmax) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val (ulo, uhi) = (umin + (umax - umin) / 4, umin + (umax - umin) / 2)
    val (tlo, thi) = (tmin + (tmax - tmin) / 4, tmin + (tmax - tmin) / 2)

    Seq("hilbert", "morton").foreach { curve =>
      val root = java.nio.file.Files.createTempDirectory(s"zsp-$curve").toString
      // 10 arrival-order batches; OPTIMIZE every 3rd append + a final pass
      // — three incremental generation rewrites, the streaming cadence
      (0 until 10).foreach { i =>
        StreamingZorder.appendBatch(base.where(col("event_id") % 10 === i), root, i)
        if (i % 3 == 2) StreamingZorder.optimize(spark, root, "user_id", "ts_ms",
          numFiles, curve)
      }
      StreamingZorder.optimize(spark, root, "user_id", "ts_ms", numFiles, curve)
      val gen = StreamingZorder.latestClusteredPath(root).get
      val m = DataSkipping.statsManifest(spark, gen, Seq("user_id", "ts_ms")).cache()
      val total = m.count()
      val cand = DataSkipping.candidateFiles(m,
        Seq(DataSkipping.longRange("user_id", ulo, uhi),
          DataSkipping.longRange("ts_ms", tlo, thi))).count()
      // exactly-once across the cadence, restated here for the probe run
      val n = StreamingZorder.read(spark, root).count()
      require(n == base.count(), s"$curve: read $n rows, expected ${base.count()}")
      println(f"$curve streamed-gen quarterBox files=$cand/$total " +
        f"(${100.0 * cand / total}%.1f%%)")
      m.unpersist()
    }
    spark.stop()
  }
}
