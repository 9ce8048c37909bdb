package graft.tools

import graft.ops.Layout
import org.apache.spark.sql.functions._

/** Dev tool: materialize the same events table under three physical
  * layouts — arrival order (by event_id), single-column time sort, and
  * z-order on (user_id, ts_ms) — so row-group pruning can be measured
  * from the parquet footers (SCALING.md). Each layout is 16 files sorted
  * within partitions, so min/max stats are as tight as the layout allows.
  *
  * Usage: runMain graft.tools.ZorderProbe <sfDir> <destDir> [numFiles]
  */
object ZorderProbe {
  def main(args: Array[String]): Unit = {
    val (src, dest) = (args(0), args(1))
    val nf = if (args.length > 2) args(2).toInt else 16
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val evRaw = spark.read.parquet(s"$src/events.parquet")
    val et = graft.functions.EventTime.bind(evRaw)
    val ev = evRaw.select(col("event_id"), col("user_id"), et.ms.as("ts_ms"),
      col("event_type"), col("value"))

    ev.repartitionByRange(nf, col("event_id")).sortWithinPartitions("event_id")
      .write.mode("overwrite").parquet(s"$dest/byid")
    ev.repartitionByRange(nf, col("ts_ms")).sortWithinPartitions("ts_ms")
      .write.mode("overwrite").parquet(s"$dest/byts")
    Layout.zorderWrite(ev, "user_id", "ts_ms", s"$dest/zorder", numFiles = nf)

    Seq("byid", "byts", "zorder").foreach { l =>
      println(s"LAYOUT $l rows=${spark.read.parquet(s"$dest/$l").count()}")
    }
    spark.stop()
  }
}
