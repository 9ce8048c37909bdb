package graft

import graft.ops.{DataSkipping, ScanPrune, SketchCatalog}
import graft.plans.PrunedFileIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** [[graft.plans.DynamicFilePruning]]: a join's build-side keys prune the
  * probe table's FILE LISTING when both planning artifacts are active —
  * the composition of the runtime-filter pass (keys matter) and the
  * scan-prune registry (files have decoded stats). Soundness pinned per
  * shape: pruned ≡ plain results, anti joins untouched, artifact
  * overflow declines, Bloom modality covers scattered columns.
  */
class DynamicFilePruningSpec extends SparkSpec {

  private lazy val (factDir, dimDir, wideDimDir, catPath) = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-dfp").toString
    val fact = s"$root/fact"
    // k range-clustered over 8 files: every file owns a ~500-wide k band
    (0L until 4000L).map(i => (i, (i % 17).toDouble))
      .toDF("k", "v")
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(fact)
    // selective dim: 12 keys inside ONE band (plus dup rows — distinct
    // keys is what the pass collects)
    val dim = s"$root/dim"
    (0 until 24).map(i => (600L + (i % 12) * 3L, s"d$i"))
      .toDF("dk", "tag").coalesce(1).write.mode("overwrite").parquet(dim)
    // wide dim: keys across every band — nothing provably droppable
    val wide = s"$root/dimwide"
    (0 until 16).map(i => (i * 250L, s"w$i"))
      .toDF("dk", "tag").coalesce(1).write.mode("overwrite").parquet(wide)
    val cat = SketchCatalog.harvest(spark, dim, Seq("dk"))
      .unionByName(SketchCatalog.harvest(spark, wide, Seq("dk")))
    val catP = s"$root/catalog"
    SketchCatalog.save(cat, catP)
    (fact, dim, wide, catP)
  }

  private def prunedFiles(df: DataFrame): Option[(Int, Int)] = {
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }
    root.collect { case f: FileSourceScanExec => f.relation.location }
      .collectFirst { case p: PrunedFileIndex =>
        (p.inputFiles.length, p.underlying.inputFiles.length) }
  }

  private def deactivate(): Unit = {
    ScanPrune.deactivateAll(spark)
    SketchCatalog.deactivate(spark)
  }

  private def activate(): Unit = {
    ScanPrune.activateManifest(spark, factDir,
      DataSkipping.statsManifest(spark, factDir, Seq("k")))
    SketchCatalog.activate(spark, catPath)
  }

  /** Activated vs plain runs of one join shape must agree; returns the
    * (kept, total) probe-file counts when the listing was pruned.
    */
  private def check(mk: () => DataFrame): Option[(Int, Int)] = {
    deactivate()
    val want = mk().collect().map(_.toString).sorted.toSeq
    activate()
    try {
      val df = mk()
      val got = df.collect().map(_.toString).sorted.toSeq
      assert(got == want, "results changed under dynamic file pruning")
      prunedFiles(df)
    } finally deactivate()
  }

  test("selective dim join prunes the fact listing; results identical") {
    val kept = check(() => spark.read.parquet(factDir)
      .join(spark.read.parquet(dimDir), col("k") === col("dk"))
      .groupBy("dk").agg(count(lit(1)).as("n"), sum("v").as("s")))
    assert(kept.exists { case (k, t) => k > 0 && k < t },
      s"expected a strict dynamic prune, got $kept")
  }

  test("left-semi prunes the probe side the same way") {
    val kept = check(() => spark.read.parquet(factDir)
      .join(spark.read.parquet(dimDir), col("k") === col("dk"), "left_semi"))
    assert(kept.exists { case (k, t) => k > 0 && k < t }, s"got $kept")
  }

  test("left-anti joins are never pruned (their output IS the unmatched rows)") {
    val kept = check(() => spark.read.parquet(factDir)
      .join(spark.read.parquet(dimDir), col("k") === col("dk"), "left_anti")
      .agg(count(lit(1)).as("n"), sum("k").as("sk")))
    assert(kept.isEmpty, s"anti join must not rewrite the listing, got $kept")
  }

  test("wide dim (keys in every band) drops nothing and rides the plain plan") {
    val kept = check(() => spark.read.parquet(factDir)
      .join(spark.read.parquet(wideDimDir), col("k") === col("dk"))
      .agg(count(lit(1)).as("n")))
    // every file admits some key: drop set empty -> no wrapper at all
    assert(kept.isEmpty, s"expected no rewrite for the wide dim, got $kept")
  }

  test("artifact overflow declines: a maxKeys cap below the dim's distinct count") {
    withSQLConf(SketchCatalog.DynamicPruneMaxKeysKey -> "4") {
      val kept = check(() => spark.read.parquet(factDir)
        .join(spark.read.parquet(dimDir), col("k") === col("dk"))
        .agg(count(lit(1)).as("n")))
      assert(kept.isEmpty, s"cap=4 must decline 12 keys, got $kept")
    }
    withSQLConf(SketchCatalog.DynamicPruneMaxKeysKey -> "0") {
      val kept = check(() => spark.read.parquet(factDir)
        .join(spark.read.parquet(dimDir), col("k") === col("dk"))
        .agg(count(lit(1)).as("n")))
      assert(kept.isEmpty, "0 must disable the pass")
    }
  }

  test("composes with static scan pruning: box filter + dim keys both subtract") {
    val kept = check(() => spark.read.parquet(factDir)
      .where(col("k") < 3000L)
      .join(spark.read.parquet(dimDir), col("k") === col("dk"))
      .agg(count(lit(1)).as("n"), sum("v").as("s")))
    assert(kept.exists { case (k, t) => k > 0 && k < t }, s"got $kept")
  }

  test("bloom modality: scattered probe key prunes via the per-file Bloom index") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-dfp-bloom").toString
    val fact = s"$root/fact"
    // id hash-scattered: every file's id range is near-full-width, the
    // min/max manifest is provably blind — only the Bloom can prune
    (0L until 4000L).map(i => (i, i % 13)).toDF("id", "g")
      .repartition(8, col("id")).write.mode("overwrite").parquet(fact)
    val dim = s"$root/dim"
    Seq((42L, "a"), (77L, "b"), (3999L, "c")).toDF("dk", "tag")
      .coalesce(1).write.mode("overwrite").parquet(dim)
    val catP = s"$root/catalog"
    SketchCatalog.save(SketchCatalog.harvest(spark, dim, Seq("dk")), catP)
    DataSkipping.bloomIndex(spark, fact, "id", expectedItemsPerFile = 1000L)
      .write.mode("overwrite").parquet(s"$root/idx")
    def mk(): DataFrame = spark.read.parquet(fact)
      .join(spark.read.parquet(dim), col("id") === col("dk"))
      .groupBy("dk").agg(count(lit(1)).as("n"))
    deactivate()
    val want = mk().collect().map(_.toString).sorted.toSeq
    ScanPrune.activateBloomIndex(spark, fact, "id", spark.read.parquet(s"$root/idx"))
    SketchCatalog.activate(spark, catP)
    try {
      val df = mk()
      val got = df.collect().map(_.toString).sorted.toSeq
      assert(got == want)
      assert(prunedFiles(df).exists { case (k, t) => k > 0 && k < t },
        "bloom-only artifacts must still drive the dynamic prune")
    } finally deactivate()
  }
}
