package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Small-file compaction: the maintenance half of the lakehouse layout
  * suite ([[Layout]] writes clustered files, [[DataSkipping]] reads
  * them, streaming ingest — [[graft.streaming.StreamingZorder]] —
  * inevitably accretes SMALL files between OPTIMIZE passes). At 100 TB
  * the small-file tax is scheduling and footer overhead: a million
  * 1 MB files cost a million tasks and a million footer fetches per
  * scan; compaction exists to re-amortize that into target-sized files.
  *
  * The plan is deterministic greedy first-fit-decreasing over the FILE
  * list — driver-side, file-count-bounded (the same artifact class as
  * the skipping candidate list); FFD is the textbook 11/9·OPT + 6/9
  * bin-packing approximation, and determinism (sort by bytes desc,
  * path asc) makes the plan replayable and auditable. Files larger
  * than the target get a singleton bin (compaction never splits —
  * splitting is the layout job's business, not the packer's).
  *
  * Execution is ONE Spark job: the bin id joins on via
  * `input_file_name`, one hash exchange keyed by bin, and a
  * `partitionBy(bin)` write leaves exactly one file per bin (each
  * bin's rows land in one task). Row-level content is provably
  * preserved — the registered gate replays count/sum aggregates over
  * the compacted table verbatim.
  */
object Compaction {

  /** (file, bytes) for every data file of a parquet table dir, via the
    * path's own Hadoop FileSystem (any store, the StreamingZorder
    * lesson).
    */
  def fileSizes(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val rows = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => Row(s.getPath.toString, s.getLen))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("file", StringType, nullable = false),
        StructField("bytes", LongType, nullable = false))))
  }

  /** Deterministic FFD packing of `sizes` into bins of `targetBytes`:
    * (file, bytes, bin). Oversize files become singleton bins.
    *
    * Driver-memory bound, stated: the collected plan input is (path,
    * bytes) pairs — ~100 B/file, so ~100 MB transient heap at 1M files
    * (the Delta OPTIMIZE planning class), and the FFD sort is
    * O(F log F) driver CPU. A table whose file COUNT outgrows that
    * bound needs partition-scoped compaction passes (plan per
    * partition), not a bigger driver.
    */
  def compactionPlan(sizes: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "compactionPlan: positive target size")
    val spark = sizes.sparkSession
    val files = sizes.select(col("file"), col("bytes")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (f, b) => (-b, f) }
    val bins = scala.collection.mutable.ArrayBuffer.empty[Long] // remaining
    val placed = files.map { case (f, b) =>
      val i = bins.indexWhere(_ >= b)
      val bin = if (b >= targetBytes) { // singleton (never joined by others)
        bins += -1L; bins.length - 1
      } else if (i >= 0) { bins(i) -= b; i }
      else { bins += (targetBytes - b); bins.length - 1 }
      Row(f, b, bin.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(placed.toIndexedSeq, 1),
      StructType(Seq(StructField("file", StringType, nullable = false),
        StructField("bytes", LongType, nullable = false),
        StructField("bin", LongType, nullable = false))))
  }

  /** CLUSTERING-PRESERVING compaction plan: deterministic next-fit over
    * files in `ord` order (their clustering-key minimum from the stats
    * manifest) — adjacent files merge, so if the input files were
    * range-DISJOINT on the layout key (a [[Layout]] write, a
    * [[graft.streaming.StreamingZorder]] generation), the merged files
    * are too, and every skipping property survives the rewrite. The FFD
    * plan ([[compactionPlan]]) packs ~11/9·OPT bins but interleaves
    * far-apart key ranges into one file, widening every merged file's
    * min/max to near-full-domain — small-file tax traded for scan tax.
    * Next-fit packs slightly worse (no lookback) and keeps the layout;
    * `sizes` must carry (file, bytes, ord). Oversize files close their
    * bin like any other — never split (the [[compactionPlan]] rule).
    */
  def sequentialCompactionPlan(sizes: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "sequentialCompactionPlan: positive target size")
    val spark = sizes.sparkSession
    // a null ord (a file whose manifest stats are unknown) would sort
    // nulls-first into the lowest-range bins, quietly breaking the
    // range-disjointness this plan exists to preserve — refuse loudly,
    // matching manifestAfterCompaction's coverage posture
    val unknownOrd = sizes.where(col("ord").isNull).count()
    require(unknownOrd == 0L,
      s"sequentialCompactionPlan: $unknownOrd file(s) with null ord — a file " +
        "with unknown clustering stats cannot be placed without breaking " +
        "range disjointness; harvest the missing footers first " +
        "(DataSkipping.statsManifestFiles) or exclude those files")
    // ordering happens IN Spark (orderBy knows the ord column's type;
    // a driver-side string sort would misorder numerics)
    val files = sizes.select(col("file"), col("bytes"), col("ord"))
      .orderBy(col("ord"), col("file")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    var bin = 0L
    var filled = 0L
    val placed = files.map { case (f, b) =>
      if (filled > 0L && filled + b > targetBytes) { bin += 1; filled = 0L }
      filled += b
      Row(f, b, bin)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(placed.toIndexedSeq, 1),
      StructType(Seq(StructField("file", StringType, nullable = false),
        StructField("bytes", LongType, nullable = false),
        StructField("bin", LongType, nullable = false))))
  }

  /** Execute a plan: one job, one exchange on the bin id, one output
    * file per bin under `outDir` (`bin=*` partition dirs). Join key is
    * the file basename — `input_file_name` and the Hadoop listing
    * render the scheme differently.
    */
  def compact(spark: SparkSession, dir: String, plan: DataFrame,
              outDir: String): Unit = {
    def base(c: org.apache.spark.sql.Column) = element_at(split(c, "/"), -1)
    val nBins = math.max(1, plan.agg(countDistinct(col("bin"))).head().getLong(0).toInt)
    spark.read.parquet(dir)
      .withColumn("__f", base(input_file_name()))
      .join(broadcast(plan.select(base(col("file")).as("__f"), col("bin"))), "__f")
      .drop("__f")
      .repartition(nBins, col("bin"))
      .write.partitionBy("bin").mode("overwrite").parquet(outDir)
  }
}
