package graft.tools

import graft.ops.{Compaction, DataSkipping}
import org.apache.spark.sql.functions._

/** Dev probe: what does FFD compaction COST a clustered table in
  * skipping, vs the ordered next-fit plan ([[Compaction
  * .sequentialCompactionPlan]])? Fixture: events rewritten range-
  * clustered on event_id into 64 files, compacted 4:1 both ways;
  * observable: files a mid-domain box must open, from each output's
  * derived manifest, plus the packing quality both plans achieved
  * (bins used for the same target).
  *
  * Usage: runMain graft.tools.OrderedCompactProbe <sfDir>
  */
object OrderedCompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-ocp").toString
    val in = s"$tmp/in"
    base.repartitionByRange(64, col("event_id"))
      .sortWithinPartitions("event_id")
      .write.mode("overwrite").parquet(in)
    val m0 = DataSkipping.statsManifest(spark, in, Seq("event_id")).cache()
    val sizes = Compaction.fileSizes(spark, in).cache()
    val total = sizes.agg(sum(col("bytes"))).head().getLong(0)
    val target = math.max(1L, total / 16)
    val n = base.count()
    val (lo, hi) = (n / 2, n / 2 + n / 8)

    def leg(name: String, plan: org.apache.spark.sql.DataFrame): Unit = {
      val out = s"$tmp/$name"
      Compaction.compact(spark, in, plan, out)
      val binFiles = DataSkipping.compactedFiles(spark, out)
      val m = DataSkipping.manifestAfterCompaction(m0, plan, binFiles)
      val cand = DataSkipping.candidateFiles(m,
        Seq(DataSkipping.longRange("event_id", lo, hi))).count()
      val files = binFiles.count()
      println(f"$name%-8s files=$files%3d boxOpens=$cand%3d (${100.0 * cand / files}%.0f%%)")
    }
    leg("ffd", Compaction.compactionPlan(sizes, target))
    leg("ordered", Compaction.sequentialCompactionPlan(
      sizes.join(m0.select(col("file"), col("event_id_min").as("ord")), Seq("file")),
      target))
    spark.stop()
  }
}
