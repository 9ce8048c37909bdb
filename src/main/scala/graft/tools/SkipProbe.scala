package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{DataSkipping, Layout}

/** Dev probe: how many files does the stats manifest let a 2-d probe box
  * skip ([[graft.ops.DataSkipping]]), and what does that do to scan wall
  * time — on a Z-ORDERED layout vs the same data linear-sorted on one
  * column (the layout a naive ORDER BY produces)?
  *
  * The claim under test is the whole point of X9z + X9ds together:
  * linear sort gives tight file ranges on ONE column (a box on the other
  * column prunes nothing), the z-layout bounds every interleaved
  * dimension, so the SAME manifest logic skips in both dimensions.
  * Observables per layout: candidate-file fraction for the registered
  * probe-box shape and the pruned-read wall vs the full-scan filter.
  *
  * Usage: runMain graft.tools.SkipProbe <sfDir> [numFiles]
  */
object SkipProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val numFiles = if (args.length > 1) args(1).toInt else 128
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = spark.read.parquet(s"$dir/events.parquet")
    val et = graft.functions.EventTime.bind(ev, "ts")
    val base = ev.select(col("event_id"), col("user_id"), et.ms.as("ts_ms"),
      col("value"))
    val b = base.agg(min("user_id"), max("user_id"), min("ts_ms"), max("ts_ms")).head()
    val (umin, umax, tmin, tmax) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val (ulo, uhi) = (umin + (umax - umin) / 4, umin + (umax - umin) / 2)
    val (tlo, thi) = (tmin + (tmax - tmin) / 4, tmin + (tmax - tmin) / 2)
    val rowFilter = col("user_id").between(ulo, uhi) && col("ts_ms").between(tlo, thi)

    def probe(label: String, path: String): Unit = {
      val m = DataSkipping.statsManifest(spark, path, Seq("user_id", "ts_ms")).cache()
      val total = m.count()
      // per-dimension boxes: the 1-d layout's blind spot is the ts-only box
      val uOnly = DataSkipping.candidateFiles(m,
        Seq(DataSkipping.longRange("user_id", ulo, uhi))).count()
      val tOnly = DataSkipping.candidateFiles(m,
        Seq(DataSkipping.longRange("ts_ms", tlo, thi))).count()
      val cand = DataSkipping.candidateFiles(m,
        Seq(DataSkipping.longRange("user_id", ulo, uhi),
          DataSkipping.longRange("ts_ms", tlo, thi))).cache()
      val nCand = cand.count()
      println(s"$label userOnlyBox=$uOnly/$total tsOnlyBox=$tOnly/$total")
      def time(f: => DataFrame): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = f.agg(count(lit(1))).head().getLong(0)
        (n, (System.nanoTime() - t0) / 1e9)
      }
      val (nFull, tFull) = time(spark.read.parquet(path).where(rowFilter))
      val (nPruned, tPruned) = time(
        DataSkipping.prunedRead(spark, path, cand).where(rowFilter))
      require(nFull == nPruned, s"$label: pruned $nPruned != full $nFull")
      println(f"$label files=$nCand/$total (${100.0 * nCand / total}%.1f%%) " +
        f"rows=$nFull fullScan=$tFull%.2f s pruned=$tPruned%.2f s")
      // metadata-only aggregation: middle-half box, interior counted
      // from the manifest, only boundary files opened
      val (mUlo, mUhi) = (umin + (umax - umin) / 4, umin + 3 * (umax - umin) / 4)
      val (mTlo, mThi) = (tmin + (tmax - tmin) / 4, tmin + 3 * (tmax - tmin) / 4)
      val mc = DataSkipping.metadataBoxCount(spark, path, m,
        Seq(DataSkipping.longRange("user_id", mUlo, mUhi),
          DataSkipping.longRange("ts_ms", mTlo, mThi)),
        col("user_id").between(mUlo, mUhi) && col("ts_ms").between(mTlo, mThi)).head()
      val (mn, mMeta, mScan) = (mc.getAs[Long]("n_rows"),
        mc.getAs[Long]("n_rows_from_metadata"), mc.getAs[Long]("n_files_scanned"))
      println(f"$label metaCount rows=$mn fromMetadata=$mMeta " +
        f"(${100.0 * mMeta / math.max(1L, mn)}%.1f%%) filesOpened=$mScan/$total")
      m.unpersist(); cand.unpersist()
    }

    val zPath = java.nio.file.Files.createTempDirectory("graft-skip-z").toString
    Layout.zorderWrite(base, "user_id", "ts_ms", zPath, numFiles)
    probe("zorder", zPath)

    val hPath = java.nio.file.Files.createTempDirectory("graft-skip-h").toString
    Layout.hilbertWrite(base, "user_id", "ts_ms", hPath, numFiles)
    probe("hilbert", hPath)

    // equality modality on the z layout: per-file Bloom over the
    // scattered event_id vs its (useless) min/max ranges
    val nRows = base.count()
    val bloomIdx = DataSkipping.bloomIndex(spark, zPath, "event_id",
      math.max(64L, nRows / numFiles), fpp = 0.01).cache()
    val idManifest = DataSkipping.statsManifest(spark, zPath, Seq("event_id")).cache()
    val probeKeys = Seq(0.1, 0.5, 0.9).map(q =>
      base.stat.approxQuantile("event_id", Array(q), 0.0).head.toLong)
    probeKeys.foreach { k =>
      val viaRange = DataSkipping.candidateFiles(idManifest,
        Seq(DataSkipping.longRange("event_id", k, k))).count()
      val viaBloom = DataSkipping.candidateFilesByKey(bloomIdx, lit(k)).count()
      val found = DataSkipping.prunedRead(spark, zPath,
        DataSkipping.candidateFilesByKey(bloomIdx, lit(k)))
        .where(col("event_id") === k).count()
      println(s"pointLookup key=$k viaMinMax=$viaRange/$numFiles " +
        s"viaBloom=$viaBloom/$numFiles rows=$found")
    }

    val lPath = java.nio.file.Files.createTempDirectory("graft-skip-l").toString
    base.repartitionByRange(numFiles, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(lPath)
    probe("linear", lPath)

    // 3-D: a box constraining ALL THREE dimensions, third dimension
    // INDEPENDENT of the first two (value-derived key) — a 2-D layout on
    // (user, ts) is blind on it, the d-dimensional Hilbert bounds every
    // interleaved dimension. event_id is the CONTROL: it correlates with
    // ts in this table, so interleaving it buys nothing over 2-D (the
    // don't-cluster-correlated-columns lesson, measured).
    val base3 = base.withColumn("vkey", (col("value") * 1e6).cast("long"))
    val bv = base3.agg(min("vkey"), max("vkey"),
      min("event_id"), max("event_id")).head()
    val (vmin, vmax) = (bv.getLong(0), bv.getLong(1))
    val (vlo, vhi) = (vmin + (vmax - vmin) / 4, vmin + (vmax - vmin) / 2)
    val (emin, emax) = (bv.getLong(2), bv.getLong(3))
    val (elo, ehi) = (emin + (emax - emin) / 4, emin + (emax - emin) / 2)
    def probe3(label: String, path: String, dim3: String,
               lo3: Long, hi3: Long): Unit = {
      val m = DataSkipping.statsManifest(spark, path,
        Seq("user_id", "ts_ms", dim3)).cache()
      val total = m.count()
      val ranges3 = Seq(DataSkipping.longRange("user_id", ulo, uhi),
        DataSkipping.longRange("ts_ms", tlo, thi),
        DataSkipping.longRange(dim3, lo3, hi3))
      val filter3 = rowFilter && col(dim3).between(lo3, hi3)
      val cand = DataSkipping.candidateFiles(m, ranges3).cache()
      val nCand = cand.count()
      val full = spark.read.parquet(path).where(filter3).count()
      val pruned = DataSkipping.prunedRead(spark, path, cand).where(filter3).count()
      require(full == pruned, s"$label: pruned $pruned != full $full")
      println(f"$label box3($dim3) files=$nCand/$total " +
        f"(${100.0 * nCand / total}%.1f%%) rows=$full")
      m.unpersist(); cand.unpersist()
    }
    // independent third dimension: 3-D layout vs 2-D on two-of-three
    val h3v = java.nio.file.Files.createTempDirectory("graft-skip-h3v").toString
    Layout.hilbertWriteN(base3, Seq("user_id", "ts_ms", "vkey"), h3v,
      numFiles, Layout.HBits3)
    val h2v = java.nio.file.Files.createTempDirectory("graft-skip-h2v").toString
    Layout.hilbertWrite(base3, "user_id", "ts_ms", h2v, numFiles)
    probe3("hilbert3", h3v, "vkey", vlo, vhi)
    probe3("hilbert2of3", h2v, "vkey", vlo, vhi)
    // correlated third dimension (event_id ~ ts): the control
    val h3e = java.nio.file.Files.createTempDirectory("graft-skip-h3e").toString
    Layout.hilbertWriteN(base3, Seq("user_id", "ts_ms", "event_id"), h3e,
      numFiles, Layout.HBits3)
    probe3("hilbert3corr", h3e, "event_id", elo, ehi)
    probe3("hilbert2corr", h2v, "event_id", elo, ehi)

    spark.stop()
  }
}
