package graft

import graft.ops.{ActivationStore, DataSkipping, SketchCatalog}
import graft.plans.PrunedFileIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** [[graft.ops.ActivationStore]]: the persisted activation registry.
  * Asserted here: a FRESH session that knows only the registry path
  * (the conf + `GraftSession.attach` — exactly what `GraftSession.local`
  * runs) opens strictly fewer files on a manifested table with ZERO
  * explicit `activate*` calls, with results identical to the unpruned
  * read; a registry gone STALE under an append stays sound (appended
  * rows visible — the drop-set subtraction) while still pruning the
  * manifested files; re-registration supersedes compactly; the
  * highest-revision catalog wins; and a registered-but-unreadable
  * artifact degrades loudly (failed list) without blocking the rest.
  */
class ActivationStoreSpec extends SparkSpec {

  private def prunedFiles(df: DataFrame): Option[(Int, Int)] = {
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }
    root.collect { case f: FileSourceScanExec => f }
      .headOption.flatMap(_.relation.location match {
        case p: PrunedFileIndex =>
          Some((p.inputFiles.length, p.underlying.inputFiles.length))
        case _ => None
      })
  }

  private def fixture(name: String): (String, String, String) = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-actstore-$name").toString
    val tbl = s"$d/t"
    spark.range(0L, 4000L)
      .select(col("id").as("u"), (col("id") % 7).cast("double").as("v"))
      .repartitionByRange(8, col("u")).sortWithinPartitions("u")
      .write.mode("overwrite").parquet(tbl)
    val manPath = s"$d/manifest"
    DataSkipping.statsManifest(spark, tbl, Seq("u"))
      .write.mode("overwrite").parquet(manPath)
    (d, tbl, manPath)
  }

  test("fresh session auto-activates the stored registry: strictly fewer files, rows identical, zero activate* calls") {
    val (d, tbl, manPath) = fixture("auto")
    val registry = s"$d/registry"
    ActivationStore.registerManifest(spark, registry, tbl, manPath)

    def q(s: SparkSession): DataFrame =
      s.read.parquet(tbl).where(col("u").between(500L, 900L))

    // control: a fresh session with no registry conf stays on the full listing
    val control = spark.newSession()
    val plain = q(control).collect().map(_.toString).sorted.toSeq
    assert(prunedFiles(q(control)).isEmpty,
      "control fresh session must not prune")

    // the zero-code path: conf + attach (what GraftSession.local runs)
    val fresh = spark.newSession()
    fresh.conf.set(ActivationStore.RegistryConfKey, registry)
    val report = GraftSession.attach(fresh).get
    assert(report.failed.isEmpty && report.activated.size == 1, s"$report")
    val kept = prunedFiles(q(fresh))
    assert(kept.exists { case (k, t) => k > 0 && k < t },
      s"expected a strict file prune from the auto-loaded manifest, got $kept")
    assert(q(fresh).collect().map(_.toString).sorted.toSeq == plain,
      "auto-activated pruning must be invisible to results")
  }

  test("stale registry under an append: appended rows stay visible, manifested files still prune") {
    val (d, tbl, manPath) = fixture("stale")
    val registry = s"$d/registry"
    ActivationStore.registerManifest(spark, registry, tbl, manPath)
    // the append the registry does NOT know about
    spark.range(4000L, 4200L)
      .select(col("id").as("u"), (col("id") % 7).cast("double").as("v"))
      .coalesce(1).write.mode("append").parquet(tbl)

    val fresh = spark.newSession()
    fresh.conf.set(ActivationStore.RegistryConfKey, registry)
    GraftSession.attach(fresh)
    val control = spark.newSession()

    // a predicate ONLY the appended (unmanifested) file satisfies: its
    // rows must all surface — the drop-set subtraction never drops a
    // file the manifest has no stats for
    def late(s: SparkSession): Seq[String] =
      s.read.parquet(tbl).where(col("u") >= 4100L)
        .collect().map(_.toString).sorted.toSeq
    assert(late(fresh) == late(control) && late(fresh).size == 100,
      "stale manifest must not hide appended rows")

    // and the manifested files still prune for an old-range predicate
    def old(s: SparkSession): DataFrame =
      s.read.parquet(tbl).where(col("u").between(500L, 900L))
    val kept = prunedFiles(old(fresh))
    assert(kept.exists { case (k, t) => k > 0 && k < t },
      s"stale-but-covering manifest must still prune, got $kept")
    assert(old(fresh).collect().map(_.toString).sorted.toSeq ==
      old(control).collect().map(_.toString).sorted.toSeq)
  }

  test("refresh re-derives every artifact from the grown table: appended files prune, catalog rows grow") {
    val (d, tbl, manPath) = fixture("refresh")
    val registry = s"$d/registry"
    ActivationStore.registerManifest(spark, registry, tbl, manPath)
    val bloomPath = s"$d/bloom"
    DataSkipping.bloomIndex(spark, tbl, "u", expectedItemsPerFile = 1024)
      .write.mode("overwrite").parquet(bloomPath)
    ActivationStore.registerBloomIndex(spark, registry, tbl, "u", bloomPath)
    val catPath = s"$d/cat"
    SketchCatalog.save(SketchCatalog.harvest(spark, tbl, Seq("u")), catPath)
    ActivationStore.registerCatalog(spark, registry, catPath)

    // the table grows: one appended file far above the original range
    spark.range(100000L, 100500L)
      .select(col("id").as("u"), (col("id") % 7).cast("double").as("v"))
      .coalesce(1).write.mode("append").parquet(tbl)

    val rep = ActivationStore.refresh(spark, registry)
    assert(rep.failed.isEmpty && rep.refreshed.size == 3, s"$rep")

    val fresh = spark.newSession()
    fresh.conf.set(ActivationStore.RegistryConfKey, registry)
    GraftSession.attach(fresh)
    // an old-range predicate must now DROP the appended file too: with
    // the stale manifest it stayed (unmanifested files are never
    // dropped); post-refresh its stats prove it out of range
    val kept = prunedFiles(
      fresh.read.parquet(tbl).where(col("u").between(500L, 900L)))
    assert(kept.exists { case (k, t) => k > 0 && k <= 2 && t == 9 },
      "refreshed manifest must keep only the 1-2 in-range originals of all " +
        s"9 files — the appended file now has stats proving it out of range — got $kept")
    // parity against an unactivated session on both ranges
    val control = spark.newSession()
    def rows(s: SparkSession, lo: Long, hi: Long): Seq[String] =
      s.read.parquet(tbl).where(col("u").between(lo, hi))
        .collect().map(_.toString).sorted.toSeq
    assert(rows(fresh, 500L, 900L) == rows(control, 500L, 900L))
    assert(rows(fresh, 100000L, 100500L) == rows(control, 100000L, 100500L) &&
      rows(fresh, 100000L, 100500L).size == 500)
    // the refreshed catalog counts the appended rows
    val nRows = spark.read.parquet(catPath).where(col("key") === "u")
      .select("n_rows").head().getLong(0)
    assert(nRows == 4500L, s"refreshed catalog must count appended rows, got $nRows")
    // the refreshed bloom index covers the appended file
    val idxFiles = spark.read.parquet(bloomPath).count()
    assert(idxFiles == 9L, s"refreshed index must cover all 9 files, got $idxFiles")
  }

  test("row-group-grain manifest survives the registry round trip: the band-gap file drops for a fresh session") {
    // band-gap layout: sorted DISTINCT multiples of 1000 forced into tiny
    // row groups — any (x+1, x+999) box between one group's max and the
    // next group's min overlaps the FILE's folded range while provably
    // missing every group (the x9_skipping_rg shape). File grain cannot
    // drop the file; row-group grain must — and must still do so after
    // the manifest rides the registry's parquet round trip.
    val d = java.nio.file.Files.createTempDirectory("graft-actstore-rg").toString
    val tbl = s"$d/t"
    spark.range(0L, 2000L).select((col("id") * 1000L).as("u"))
      .coalesce(1).sortWithinPartitions("u")
      .write.option("parquet.block.size", "2048").option("parquet.page.size", "512")
      .parquet(tbl)
    val rg = DataSkipping.rowGroupManifest(spark, tbl, Seq("u"))
    assert(rg.groupBy("file").count().agg(min("count")).head().getLong(0) >= 2L,
      "fixture must have multiple row groups per file")
    val x = rg.orderBy(col("u_min").asc, col("row_group").asc)
      .select("u_max").head().getLong(0)
    val rgPath = s"$d/rg_manifest"
    rg.write.mode("overwrite").parquet(rgPath)
    val fgPath = s"$d/fg_manifest"
    DataSkipping.statsManifest(spark, tbl, Seq("u"))
      .write.mode("overwrite").parquet(fgPath)

    def kept(s: SparkSession): Option[(Int, Int)] =
      prunedFiles(s.read.parquet(tbl).where(col("u").between(x + 1L, x + 999L)))

    // file grain through the registry: no drop possible (the box sits
    // inside the file's folded range)
    val regFg = s"$d/registry_fg"
    ActivationStore.registerManifest(spark, regFg, tbl, fgPath)
    val sFg = spark.newSession()
    sFg.conf.set(ActivationStore.RegistryConfKey, regFg)
    assert(GraftSession.attach(sFg).get.failed.isEmpty)
    // a zero-drop prune leaves the plan unrewritten (no PrunedFileIndex)
    assert(kept(sFg).isEmpty,
      s"file grain must prove no drop for the band-gap box, got ${kept(sFg)}")

    // row-group grain through the registry: every group excludes the box,
    // so the file drops — proving the rg rows round-tripped intact
    val regRg = s"$d/registry_rg"
    ActivationStore.registerManifest(spark, regRg, tbl, rgPath)
    val sRg = spark.newSession()
    sRg.conf.set(ActivationStore.RegistryConfKey, regRg)
    assert(GraftSession.attach(sRg).get.failed.isEmpty)
    assert(kept(sRg).exists { case (k, t) => k < t },
      s"row-group grain must drop the band-gap file, got ${kept(sRg)}")
    // and the box is provably row-free either way
    assert(sRg.read.parquet(tbl).where(col("u").between(x + 1L, x + 999L)).count() == 0L)
  }

  test("re-registration supersedes compactly; latest catalog wins; unreadable artifact is loud but non-fatal") {
    val (d, tbl, manPath) = fixture("super")
    val registry = s"$d/registry"
    ActivationStore.registerManifest(spark, registry, tbl, manPath)
    val r2 = ActivationStore.registerManifest(spark, registry, tbl, manPath)
    assert(r2.revision == 2L)
    assert(ActivationStore.registrations(spark, registry).size == 1,
      "same (table, kind, column) re-registration must supersede, not accrete")
    // compaction folds append history without changing the logical view
    ActivationStore.compactRegistry(spark, registry)
    assert(ActivationStore.registrations(spark, registry) ==
      Seq(r2), "compaction must preserve the latest-wins view")

    // two catalogs: load must activate the LATEST revision only
    val cat1 = s"$d/cat1"; val cat2 = s"$d/cat2"
    SketchCatalog.save(SketchCatalog.harvest(spark, tbl, Seq("u")), cat1)
    SketchCatalog.save(SketchCatalog.harvest(spark, tbl, Seq("u")), cat2)
    ActivationStore.registerCatalog(spark, registry, cat1)
    ActivationStore.registerCatalog(spark, registry, cat2)
    val s1 = spark.newSession()
    s1.conf.set(ActivationStore.RegistryConfKey, registry)
    val rep1 = GraftSession.attach(s1).get
    assert(rep1.failed.isEmpty)
    assert(s1.conf.get(SketchCatalog.ConfKey) ==
      SketchCatalog.normalizePath(spark, cat2),
      "the highest-revision catalog registration must win")

    // a second table whose registered manifest was deleted: its row
    // lands in failed, everything else still activates
    val tbl2 = s"$d/t2"
    spark.range(0L, 100L).select(col("id").as("u"))
      .coalesce(1).write.parquet(tbl2)
    ActivationStore.registerManifest(spark, registry, tbl2, s"$d/no-such-manifest")
    val s2 = spark.newSession()
    s2.conf.set(ActivationStore.RegistryConfKey, registry)
    val rep2 = GraftSession.attach(s2).get
    assert(rep2.failed.size == 1 && rep2.failed.head._1.table.endsWith("/t2"),
      s"unreadable artifact must be reported, got $rep2")
    assert(rep2.activated.size == 2, // tbl manifest + latest catalog
      s"remaining registrations must still activate, got $rep2")
    // and the manifested first table still prunes in that session
    val kept = prunedFiles(
      s2.read.parquet(tbl).where(col("u").between(500L, 900L)))
    assert(kept.exists { case (k, t) => k > 0 && k < t })
  }
}
