package graft

import graft.ops.{DataSkipping, ScanPrune}
import graft.plans.PrunedFileIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** [[graft.plans.ScanPruneRewrite]]: activating a stats manifest turns a
  * PLAIN filtered read into a file-pruned scan — no call-site changes —
  * with the same soundness contract as the hand-invoked
  * [[DataSkipping.prunedRead]] path: a dropped file must be PROVABLY
  * impossible for the predicate, unknown and unmanifested files stay,
  * and the rewrite never changes results (asserted per modality and over
  * a randomized predicate battery).
  */
class ScanPruneRewriteSpec extends SparkSpec {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft-scanprune").toString
    import spark.implicits._
    val rows = (0L until 4000L).map { i =>
      val day = f"2024-01-${(i / 400) % 30 + 1}%02d"
      val payload = if (i % 5 == 0) s"p$i" else null
      (i, i.toInt, day, payload, (i % 997).toDouble / 7.0)
    }
    rows.toDF("k", "ki", "day", "payload", "v")
      .repartitionByRange(8, col("k"))
      .sortWithinPartitions("k")
      .write.mode("overwrite").parquet(s"$d/t")
    s"$d/t"
  }

  private def activate(): Unit = {
    val manifest = DataSkipping.statsManifest(spark, dir,
      Seq("k", "ki", "day", "payload"))
    ScanPrune.activateManifest(spark, dir, manifest)
  }

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }
    root.collect { case f: FileSourceScanExec => f }
  }

  private def prunedFiles(df: DataFrame): Option[(Int, Int)] =
    scans(df).headOption.flatMap(_.relation.location match {
      case p: PrunedFileIndex =>
        Some((p.inputFiles.length, p.underlying.inputFiles.length))
      case _ => None
    })

  /** Pruned and plain runs of the same predicate must agree; returns the
    * (kept, total) file counts when the scan was rewritten.
    */
  private def check(pred: org.apache.spark.sql.Column): Option[(Int, Int)] = {
    ScanPrune.deactivateAll(spark)
    val plain = spark.read.parquet(dir).where(pred)
      .collect().map(_.toString).sorted.toSeq
    activate()
    try {
      val df = spark.read.parquet(dir).where(pred)
      val got = df.collect().map(_.toString).sorted.toSeq
      assert(got == plain, s"results changed under scan pruning: $pred")
      prunedFiles(df)
    } finally ScanPruneRewriteSpecState.cleanup(spark)
  }

  test("range predicate on the clustering column prunes files, same results") {
    val kept = check(col("k").between(500L, 900L))
    assert(kept.exists { case (k, t) => k < t && k > 0 },
      s"expected a strict file prune, got $kept")
  }

  test("strict bounds honored: k > max of a file's range drops it") {
    val kept = check(col("k") > 3499L)
    assert(kept.exists { case (k, t) => k < t })
    // boundary: >= on an exact file-max keeps that file
    assert(check(col("k") >= 3500L).exists { case (k, t) => k < t })
  }

  test("point and IN-list on a string column prune as unions of points") {
    assert(check(col("day") === "2024-01-02").exists { case (k, t) => k < t })
    assert(check(col("day").isin("2024-01-02", "2024-01-09"))
      .exists { case (k, t) => k < t })
  }

  test("IS NOT NULL prunes nothing here (every file holds some payload); IS NULL sound") {
    // payload is 1-in-5 scattered: no file is all-null or all-present, so
    // the null modality must keep everything — and still match results
    check(col("payload").isNotNull)
    check(col("payload").isNull)
  }

  test("OR across columns unions candidates and stays sound") {
    val kept = check(col("k") < 200L || col("day") === "2024-01-09")
    assert(kept.exists { case (k, t) => k < t })
  }

  test("unsupported-only predicates leave the scan unrewritten") {
    ScanPrune.deactivateAll(spark)
    activate()
    try {
      val df = spark.read.parquet(dir).where(pmod(col("k"), lit(7)) === 0)
      assert(prunedFiles(df).isEmpty, "modulo predicate must not rewrite")
      // mixed: the supported conjunct prunes, the unsupported one rides along
      val mixed = spark.read.parquet(dir)
        .where(col("k") < 300L && pmod(col("k"), lit(7)) === 0)
      assert(prunedFiles(mixed).exists { case (k, t) => k < t })
    } finally ScanPruneRewriteSpecState.cleanup(spark)
  }

  test("a widening cast over an INT column still prices against the long manifest") {
    // ki is IntegerType; a LONG literal forces Cast(ki AS BIGINT) = 42L,
    // which must unwrap and prune exactly like the native long column
    assert(check(col("ki") === lit(42L)).exists { case (k, t) => k == 1 && t == 8 })
    assert(check(col("k") === 42).exists { case (k, t) => k == 1 && t == 8 })
  }

  test("files appended AFTER the manifest was built are never dropped (stale under-prunes)") {
    import spark.implicits._
    val d2 = java.nio.file.Files.createTempDirectory("graft-scanprune2").toString + "/t"
    (0L until 1000L).map(i => (i, s"a$i")).toDF("k", "s")
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(d2)
    val manifest = DataSkipping.statsManifest(spark, d2, Seq("k"))
    // append rows OUTSIDE the manifested range, then activate the stale manifest
    (5000L until 5100L).map(i => (i, s"b$i")).toDF("k", "s")
      .coalesce(1).write.mode("append").parquet(d2)
    ScanPrune.activateManifest(spark, d2, manifest)
    try {
      val got = spark.read.parquet(d2).where(col("k") >= 5000L).count()
      assert(got == 100L, "appended (unmanifested) rows must stay visible")
      // and the stale manifest still prunes what it CAN prove
      val df = spark.read.parquet(d2).where(col("k") < 250L)
      assert(prunedFiles(df).exists { case (k, t) => k < t })
      assert(df.count() == 250L)
    } finally ScanPruneRewriteSpecState.cleanup(spark)
  }

  test("bloom modality: point lookups prune where min/max is blind; cross-class probes declined") {
    import spark.implicits._
    val d3 = java.nio.file.Files.createTempDirectory("graft-scanprune3").toString + "/t"
    // id is SCATTERED across files (hash layout): every file's id range is
    // near-full-width, so the manifest is blind for point predicates
    (0L until 4000L).map(i => (i, s"tag${i % 7}")).toDF("id", "tag")
      .repartition(8, col("id")).write.mode("overwrite").parquet(d3)
    ScanPrune.activateManifest(spark, d3, DataSkipping.statsManifest(spark, d3, Seq("id")))
    try {
      def probe(pred: org.apache.spark.sql.Column): Option[(Int, Int)] = {
        val df = spark.read.parquet(d3).where(pred)
        val got = df.collect().map(_.toString).sorted.toSeq
        ScanPrune.deactivateAll(spark)
        val want = spark.read.parquet(d3).where(pred).collect().map(_.toString).sorted.toSeq
        // re-activate for the next probe (registry persists; conf was cleared)
        ScanPrune.activateManifest(spark, d3, DataSkipping.statsManifest(spark, d3, Seq("id")))
        ScanPrune.activateBloomIndex(spark, d3, "id",
          spark.read.parquet(s"${d3}_idx"))
        assert(got == want, s"results changed: $pred")
        prunedFiles(df)
      }
      assert(prunedFiles(spark.read.parquet(d3).where(col("id") === 42L)).isEmpty,
        "manifest alone must be blind on the scattered column")
      DataSkipping.bloomIndex(spark, d3, "id", expectedItemsPerFile = 1000L)
        .write.mode("overwrite").parquet(s"${d3}_idx")
      ScanPrune.activateBloomIndex(spark, d3, "id", spark.read.parquet(s"${d3}_idx"))
      // point: exactly the filter-positive files survive, results equal
      assert(probe(col("id") === 42L).exists { case (k, t) => k < t && k > 0 })
      // IN-list: union of point candidates
      assert(probe(col("id").isin(42L, 3999L)).exists { case (k, t) => k < t })
      // cross-class probe (string literal on a long-built index): Spark
      // casts the column, the cast is non-widening -> atom declined, scan
      // unrewritten, results still fine
      assert(probe(col("id").cast("string") === "42").isEmpty)
    } finally ScanPruneRewriteSpecState.cleanup(spark)
  }

  test("bloom index over a SUBSET of files: unindexed files always stay") {
    import spark.implicits._
    val d4 = java.nio.file.Files.createTempDirectory("graft-scanprune4").toString + "/t"
    (0L until 1000L).map(i => (i, i % 5)).toDF("id", "g")
      .repartition(4, col("id")).write.mode("overwrite").parquet(d4)
    val idx = DataSkipping.bloomIndex(spark, d4, "id", 500L)
    // drop one file's row from the index: that file is UNKNOWN, not absent
    val files = idx.select("file").collect().map(_.getString(0)).sorted
    val partial = idx.where(col("file") =!= files.head)
    ScanPrune.activateBloomIndex(spark, d4, "id", partial)
    try {
      val total = spark.read.parquet(d4).where(col("id") >= 0L).count()
      assert(total == 1000L)
      // every id still found, including ids living in the unindexed file
      (0L until 1000L by 97L).foreach { k =>
        assert(spark.read.parquet(d4).where(col("id") === k).count() == 1L,
          s"id $k lost under a partial bloom index")
      }
    } finally ScanPruneRewriteSpecState.cleanup(spark)
  }

  test("partitioned tables: wrapper preserves partition values and composes with partition pruning") {
    import spark.implicits._
    val d5 = java.nio.file.Files.createTempDirectory("graft-scanprune5").toString + "/t"
    (0L until 2000L).map(i => (i, s"g${i % 2}")).toDF("k", "g")
      .repartitionByRange(4, col("k"))
      .write.partitionBy("g").mode("overwrite").parquet(d5)
    // recursive data-file listing (partition dirs have no top-level files)
    val fs = new org.apache.hadoop.fs.Path(d5)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val files = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(d5), true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) b += f.getPath.toString
      }
      b.result()
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))
    ScanPrune.activateManifest(spark, d5,
      DataSkipping.statsManifestFiles(spark, files, schema, Seq("k")))
    try {
      val pred = col("k") < 300L && col("g") === "g1"
      val df = spark.read.parquet(d5).where(pred)
      val got = df.collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("g"))).sorted.toSeq
      ScanPrune.deactivateAll(spark)
      val want = spark.read.parquet(d5).where(pred)
        .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("g"))).sorted.toSeq
      assert(got == want && want.nonEmpty && want.forall(_._2 == "g1"),
        "partition values must survive the pruned listing")
      ScanPrune.activateManifest(spark, d5,
        DataSkipping.statsManifestFiles(spark, files, schema, Seq("k")))
      assert(prunedFiles(spark.read.parquet(d5).where(pred))
        .exists { case (kept, total) => kept < total && kept > 0 },
        "stats pruning must fire inside partition dirs")
    } finally ScanPruneRewriteSpecState.cleanup(spark)
  }

  test("maintenance loop: a DERIVED post-compaction manifest (zero footer reads) activates and prunes exactly") {
    import graft.ops.Compaction
    import spark.implicits._
    val d6 = java.nio.file.Files.createTempDirectory("graft-scanprune6").toString + "/t"
    (0L until 4000L).map(i => (i, i % 13)).toDF("k", "v")
      .repartitionByRange(12, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(d6)
    val m0 = DataSkipping.statsManifest(spark, d6, Seq("k"))
    val sizes = Compaction.fileSizes(spark, d6)
      .join(m0.select(col("file"), col("k_min").as("ord")), Seq("file"))
    val total = sizes.agg(sum(col("bytes"))).head().getLong(0)
    val plan = Compaction.sequentialCompactionPlan(sizes, math.max(1L, total / 4))
    val out = java.nio.file.Files.createTempDirectory("graft-scanprune6o").toString + "/t"
    Compaction.compact(spark, d6, plan, out)
    val binFiles = DataSkipping.compactedFiles(spark, out)
    // the maintenance path: manifest FOLDED from the plan, no footer read
    val derived = DataSkipping.manifestAfterCompaction(m0, plan, binFiles)
    ScanPrune.activateManifest(spark, out, derived)
    try {
      val pred = col("k").between(1700L, 2100L)
      val df = spark.read.parquet(out).where(pred)
      val got = df.agg(count(lit(1)), sum("k")).head()
      assert(prunedFiles(df).exists { case (kept, tot) => kept < tot && kept > 0 },
        "the derived manifest must prune the compacted table")
      ScanPrune.deactivateAll(spark)
      val want = spark.read.parquet(out).where(pred).agg(count(lit(1)), sum("k")).head()
      assert(got == want && got.getLong(0) == 401L)
    } finally ScanPruneRewriteSpecState.cleanup(spark)
  }

  test("randomized predicate battery: pruned ≡ plain on every draw") {
    val rnd = new scala.util.Random(42)
    (1 to 12).foreach { _ =>
      val lo = rnd.nextInt(4000).toLong
      val hi = lo + rnd.nextInt(1500)
      val day = f"2024-01-${rnd.nextInt(30) + 1}%02d"
      check(col("k").between(lo, hi))
      check(col("k") >= lo && col("day") <= day)
      check(col("day") === day || col("k") < lo)
    }
  }

  test("row-group-grain manifest: strictly more drops than file grain, pruned ≡ plain, randomized parity") {
    import spark.implicits._
    // sparse distinct values (multiples of 1000), 2 KB row groups: every
    // inter-group interval is a guaranteed empty gap at rg grain while
    // the file-grain folded range covers it
    val d = java.nio.file.Files.createTempDirectory("graft-rgprune").toString
    (0L until 2000L).map(i => (i * 1000L, i, (i % 13).toDouble))
      .toDF("k", "id", "v")
      .repartition(2, col("id")).sortWithinPartitions("k")
      .write.option("parquet.block.size", "2048")
      .option("parquet.page.size", "512").parquet(s"$d/t")
    val rg = DataSkipping.rowGroupManifest(spark, s"$d/t", Seq("k"))
    val rgRows = rg.collect()
    assert(rgRows.map(_.getAs[String]("file")).distinct.length == 2)
    assert(rgRows.length > 4, "fixture must have multiple row groups per file")
    // box strictly inside the first file's first inter-group gap
    val first = rg.orderBy(col("k_min").asc, col("file").asc, col("row_group").asc)
      .select("k_max").head().getLong(0)
    val gapPred = col("k").between(first + 1, first + 999)
    def run(pred: org.apache.spark.sql.Column): (Seq[String], Option[(Int, Int)]) = {
      val df = spark.read.parquet(s"$d/t").where(pred)
      (df.collect().map(_.toString).sorted.toSeq, prunedFiles(df))
    }
    ScanPrune.deactivateAll(spark)
    val (plainGap, _) = run(gapPred)
    try {
      // file grain: the box is interior to the first file's folded range
      ScanPrune.activateManifest(spark, s"$d/t",
        DataSkipping.statsManifest(spark, s"$d/t", Seq("k")))
      val (fgRows, fgProbe) = run(gapPred)
      assert(fgRows == plainGap)
      val fgKept = fgProbe.map(_._1).getOrElse(2)
      // rg grain: the first file's every group misses the box — fewer
      // files open than file grain kept
      ScanPrune.activateManifest(spark, s"$d/t", rg)
      val (rgRows2, rgProbe) = run(gapPred)
      assert(rgRows2 == plainGap)
      assert(rgProbe.exists(_._1 < fgKept),
        s"rg grain must open strictly fewer files (file-grain kept $fgKept, rg $rgProbe)")
      // randomized parity battery under the rg-grain activation
      val rnd = new scala.util.Random(7)
      (1 to 8).foreach { _ =>
        val lo = rnd.nextInt(2000000).toLong
        val hi = lo + rnd.nextInt(800000)
        val (got, _) = run(col("k").between(lo, hi))
        ScanPrune.deactivateAll(spark)
        val (plain, _) = run(col("k").between(lo, hi))
        assert(got == plain, s"rg-grain pruning changed results for [$lo,$hi]")
        ScanPrune.activateManifest(spark, s"$d/t", rg)
      }
    } finally ScanPruneRewriteSpecState.cleanup(spark)
  }
}

/** Conf cleanup shared by the suite (the rule must be inert between tests). */
object ScanPruneRewriteSpecState {
  def cleanup(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.ops.ScanPrune.deactivateAll(spark)
}
