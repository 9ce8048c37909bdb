package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Activation registry for PLANNER-side data skipping — the scan half of
  * the artifact-driven planning loop ([[graft.plans.SketchJoinPlanning]]
  * is the join half): a stats manifest ([[DataSkipping.statsManifest]])
  * registered here turns every plain
  * `spark.read.parquet(table).where(...)` over the table into a
  * manifest-pruned read via [[graft.plans.ScanPruneRewrite]], with no
  * hand-invocation of [[DataSkipping.prunedRead]] at the call site.
  *
  * The registry holds the manifest DECODED into driver memory — per-file
  * (min, max, nulls) triples normalized to directly comparable
  * primitives — because an optimizer rule must never run a nested Spark
  * query per plan it inspects (the [[SketchCatalog]] posture). The
  * artifact is file-count bounded (~100 B/file/column: the Delta
  * planning-metadata class — 1M files ≈ 100 MB driver heap at worst,
  * and a manifest is usually registered for a handful of hot tables).
  *
  * Soundness contract (mirrors [[DataSkipping.candidateFiles]]): a file
  * is dropped only when its KNOWN stats prove no row can satisfy the
  * predicate; unknown stats keep the file; files the manifest does not
  * cover are never dropped (the rewrite subtracts a DROP set from the
  * live listing rather than intersecting a keep set, so a file appended
  * after the manifest was built stays visible — a STALE manifest can
  * only under-prune, never lose rows).
  */
object ScanPrune {

  /** Comma-separated `table~generation` entries (table URL-encoded) with
    * an active manifest. The rule consults this session conf AND the
    * generation it names, so activation is fully per-session: each
    * activate call decodes into a fresh generation of the process-wide
    * registry, and two sessions in one JVM that activate different
    * manifests for the SAME table path each keep pruning from their own
    * decode — session B re-activating can never silently change what
    * session A's rule sees (the r12 shared-registry hazard).
    */
  val ConfKey = "spark.graft.scanPrune.tables"

  /** Comparison space of one manifest column: integral/timestamp/date
    * stats compare as longs (micros / epoch days), floating as doubles,
    * strings as unsigned UTF-8 bytes (Spark's UTF8String order = parquet
    * UTF8 stats order), decimals as scaled BigDecimal.
    */
  sealed trait Kind
  case object KLong extends Kind
  case object KDouble extends Kind
  case object KBytes extends Kind
  case object KDecimal extends Kind

  /** One column's file-grain stats, normalized to its Kind's comparable
    * form; `min`/`max` null = unknown (sound: keeps the file).
    */
  final case class ColStats(min: Any, max: Any, nulls: Option[Long])

  final case class FileStats(canonicalPath: String, nRows: Long,
                             cols: Map[String, ColStats])

  /** `rowGroups` (r14): per-file ROW-GROUP-grain stats when the activated
    * manifest was a [[DataSkipping.rowGroupManifest]] — the rewrite then
    * drops a file when EVERY row group is excluded, strictly stronger
    * than the file-grain test at identical soundness (a file's range is
    * the union of its groups' ranges, so a predicate box can overlap the
    * file while missing every group — the band-gap layout compaction
    * creates). Empty for file-grain manifests: behavior unchanged.
    */
  final class TableIndex(val table: String, val kinds: Map[String, Kind],
                         val files: Seq[FileStats],
                         val rowGroups: Map[String, Seq[FileStats]] = Map.empty) {
    val canonicalPaths: Set[String] = files.map(_.canonicalPath).toSet
  }

  /** One column's decoded per-file Bloom index ([[DataSkipping.bloomIndex]]):
    * the EQUALITY modality — min/max is blind for point predicates on
    * columns the layout scatters. `keyClass` is the recorded build hash
    * class; a probe whose literal hashes in the other class is DECLINED
    * (cross-class probes are false-negative-unsound, the
    * candidateFilesByKey contract).
    */
  final class BloomColIdx(val column: String, val keyClass: String,
                          val byFile: Map[String, org.apache.spark.util.sketch.BloomFilter])

  /** Everything activated for one table, with the decoded file UNIVERSE
    * the rewrite evaluates: per file, its manifest stats (if manifested)
    * and its per-column Bloom filters (if indexed). Files outside every
    * artifact are unknown to the rule and always kept.
    */
  final class TableArtifacts(val table: String,
                             val manifest: Option[TableIndex],
                             val blooms: Map[String, BloomColIdx]) {
    val kinds: Map[String, Kind] = manifest.map(_.kinds).getOrElse(Map.empty)
    val universe: Seq[FileCtx] = {
      val stats = manifest.map(_.files.map(f => f.canonicalPath -> f).toMap)
        .getOrElse(Map.empty)
      val paths = (stats.keySet ++ blooms.values.flatMap(_.byFile.keys)).toSeq.sorted
      paths.map { p =>
        FileCtx(p, stats.get(p),
          blooms.collect { case (c, bi) if bi.byFile.contains(p) => c -> bi.byFile(p) },
          manifest.map(_.rowGroups.getOrElse(p, Nil)).getOrElse(Nil))
      }
    }
  }

  /** One file as the rewrite sees it. `rowGroups` empty = file grain. */
  final case class FileCtx(path: String, stats: Option[FileStats],
                           fileBlooms: Map[String, org.apache.spark.util.sketch.BloomFilter],
                           rowGroups: Seq[FileStats] = Nil)

  /** Decoded artifacts keyed by `table@generation`: one immutable
    * generation per activate call, so sessions pin the exact decode they
    * activated. Old generations are evicted past [[KeptGenerations]] per
    * table — eviction is SOUND by construction: a session whose pinned
    * generation was evicted gets `lookup = None` and its rule degrades to
    * no-rewrite (the full listing), never to another session's artifacts.
    */
  private val indexes =
    new java.util.concurrent.ConcurrentHashMap[String, TableArtifacts]()
  private val generations = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Generations retained per table (newest first). 8 bounds registry
    * growth under re-activation churn while keeping every realistically
    * live session's pin; an evicted pin under-prunes, never mis-prunes.
    */
  val KeptGenerations = 8

  private def genKey(table: String, gen: Long): String = s"$table@$gen"

  // newest-first generation list per table, for eviction
  private val byTableGens =
    new java.util.concurrent.ConcurrentHashMap[String, List[Long]]()

  private def registerGeneration(table: String, arts: TableArtifacts): Long = {
    val gen = generations.incrementAndGet()
    indexes.put(genKey(table, gen), arts)
    byTableGens.compute(table, (_, prev) => {
      val gens = gen :: Option(prev).getOrElse(Nil)
      val (keep, drop) = gens.splitAt(KeptGenerations)
      drop.foreach(g => indexes.remove(genKey(table, g)))
      keep
    })
    gen
  }

  /** The session's currently-pinned generation for `table`, if any —
    * the base a composing activation (manifest then Bloom) inherits.
    */
  private def sessionGen(spark: SparkSession, table: String): Option[Long] =
    activeEntries(spark.conf.getOption(ConfKey).getOrElse("")).get(table)

  /** Scheme/authority-free form of a manifest `file` string or listing
    * path — the identity under which the rewrite matches manifest rows to
    * the scan's live file listing (input_file_name URIs, Hadoop listing
    * paths and FileIndex Paths all normalize to the same string).
    */
  def canonical(file: String): String = new Path(file).toUri.getPath

  private def kindOf(dt: DataType): Option[Kind] = dt match {
    case LongType                          => Some(KLong)
    case DoubleType                        => Some(KDouble)
    case StringType                        => Some(KBytes)
    case TimestampType | TimestampNTZType  => Some(KLong)
    case DateType                          => Some(KLong)
    case _: DecimalType                    => Some(KDecimal)
    case _                                 => None
  }

  /** A collected manifest cell normalized to its Kind's comparable form
    * (timestamps → micros, dates → epoch days, strings → UTF-8 bytes).
    */
  private def normalize(v: Any, kind: Kind): Any = v match {
    case null                         => null
    case t: java.sql.Timestamp        =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)
    case i: java.time.Instant         =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i)
    case l: java.time.LocalDateTime   =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(l)
    case d: java.sql.Date             =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong
    case d: java.time.LocalDate       => d.toEpochDay
    case s: String                    =>
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    case d: java.math.BigDecimal      => d
    case d: BigDecimal                => d.bigDecimal
    case n: java.lang.Number          => kind match {
      // -0.0 normalizes to 0.0: Double.compare orders -0.0 < 0.0 while
      // Spark SQL comparisons treat them equal — a file whose footer
      // bounds are -0.0 must not be dropped for `v >= 0.0`
      case KDouble => val d = n.doubleValue(); if (d == 0.0) 0.0 else d
      case _       => n.longValue()
    }
    case other                        => other
  }

  /** Kind-typed three-way compare; both sides must already be normalized. */
  def cmp(kind: Kind, a: Any, b: Any): Int = kind match {
    case KLong    => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case KDouble  => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case KBytes   => java.util.Arrays.compareUnsigned(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    case KDecimal => a.asInstanceOf[java.math.BigDecimal]
      .compareTo(b.asInstanceOf[java.math.BigDecimal])
  }

  /** Decode `manifest` (a [[DataSkipping.statsManifest]] OR
    * [[DataSkipping.rowGroupManifest]] frame for the table at `dir`)
    * into the driver registry and add the table to the session's active
    * set — from here on [[graft.plans.ScanPruneRewrite]] prunes filtered
    * scans of the table from these stats. A row-group-grain manifest
    * (detected by its `row_group` column) additionally registers the
    * per-group stats, so the rewrite (and dynamic file pruning) drops a
    * file when EVERY row group is excluded; the file-grain rows are
    * derived here by the conservative fold — min of KNOWN mins / max of
    * KNOWN maxs with any-unknown → unknown, null counts summed only when
    * every group's is known — so the two grains cannot disagree on
    * honesty rules.
    */
  def activateManifest(spark: SparkSession, dir: String,
                       manifest: DataFrame): TableIndex = {
    val table = SketchCatalog.normalizePath(spark, dir)
    val schema = manifest.schema
    val statCols: Seq[(String, Kind)] = schema.fields.toSeq.collect {
      case f if f.name.endsWith("_min") =>
        val c = f.name.stripSuffix("_min")
        kindOf(f.dataType).map(c -> _)
    }.flatten
    val rgGrain = schema.fieldNames.contains("row_group")
    val rows = manifest.collect() // file/row-group-count bounded (the Delta class)
    def decodeRow(r: org.apache.spark.sql.Row): FileStats = {
      val cols = statCols.map { case (c, kind) =>
        val nu = r.getAs[Any](s"${c}_nulls") match {
          case null => None
          case n: java.lang.Number => Some(n.longValue())
        }
        c -> ColStats(normalize(r.getAs[Any](s"${c}_min"), kind),
          normalize(r.getAs[Any](s"${c}_max"), kind), nu)
      }.toMap
      FileStats(canonical(r.getAs[String]("file")), r.getAs[Long]("n_rows"), cols)
    }
    val idx = if (!rgGrain) {
      new TableIndex(table, statCols.toMap, rows.toSeq.map(decodeRow))
    } else {
      val groups = rows.toSeq.map(decodeRow).groupBy(_.canonicalPath)
      val files = groups.toSeq.sortBy(_._1).map { case (p, gs) =>
        val cols = statCols.map { case (c, kind) =>
          val css = gs.map(_.cols.getOrElse(c, ColStats(null, null, None)))
          val known = css.forall(cs => cs.min != null && cs.max != null)
          val mn = if (known) css.map(_.min).reduce((a, b) =>
            if (cmp(kind, a, b) <= 0) a else b) else null
          val mx = if (known) css.map(_.max).reduce((a, b) =>
            if (cmp(kind, a, b) >= 0) a else b) else null
          val nu = if (css.forall(_.nulls.isDefined))
            Some(css.map(_.nulls.get).sum) else None
          c -> ColStats(mn, mx, nu)
        }.toMap
        FileStats(p, gs.map(_.nRows).sum, cols)
      }
      new TableIndex(table, statCols.toMap, files, groups)
    }
    // compose with the SESSION's pinned generation (a Bloom index
    // activated earlier in this session rides along), never with another
    // session's latest
    val prev = sessionGen(spark, table).flatMap(g => lookupGen(table, g))
    val gen = registerGeneration(table, new TableArtifacts(table, Some(idx),
      prev.map(_.blooms).getOrElse(Map.empty)))
    setActive(spark, table, gen)
    idx
  }

  /** Decode a per-file Bloom index ([[DataSkipping.bloomIndex]] output
    * over `column` of the table at `dir`) into the driver registry — the
    * EQUALITY modality of planner-side skipping: point and IN-list
    * predicates on `column` prune to the files whose filters might
    * contain the key (false positives only; an unindexed file always
    * stays). The decoded artifact is the index's own bytes (~1.2 KB per
    * 1k keys per file — the same bounded class as the stored parquet).
    */
  def activateBloomIndex(spark: SparkSession, dir: String, column: String,
                         index: DataFrame): Unit = {
    val table = SketchCatalog.normalizePath(spark, dir)
    val keyClass =
      if (index.columns.contains("key_class"))
        index.select("key_class").head().getString(0)
      else graft.functions.BloomHashClass.of(
        spark.read.parquet(dir).schema(column).dataType)
    val byFile = index.select(col("file"), col("bloom")).collect().map { r =>
      canonical(r.getString(0)) ->
        org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
    }.toMap
    val bi = new BloomColIdx(column, keyClass, byFile)
    val prev = sessionGen(spark, table).flatMap(g => lookupGen(table, g))
    val gen = registerGeneration(table, new TableArtifacts(table,
      prev.flatMap(_.manifest),
      prev.map(_.blooms).getOrElse(Map.empty) + (column -> bi)))
    setActive(spark, table, gen)
  }

  // the active set serializes into ONE conf string comma-separated, so
  // entries are URL-encoded: a table path containing a comma would
  // otherwise split into fragments that never match a scan's root path
  // (the rule silently inert, deactivate unable to remove the shards).
  // The generation rides each entry after '~' — URLEncoder never emits a
  // literal '~' (it escapes to %7E), so the separator cannot collide.
  private def encode(t: String): String =
    java.net.URLEncoder.encode(t, "UTF-8")
  private def decode(t: String): String =
    java.net.URLDecoder.decode(t, "UTF-8")

  private def setActive(spark: SparkSession, table: String, gen: Long): Unit = {
    val cur = activeEntries(spark.conf.getOption(ConfKey).getOrElse(""))
    val active = cur + (table -> gen)
    spark.conf.set(ConfKey, active.toSeq.sortBy(_._1)
      .map { case (t, g) => s"${encode(t)}~$g" }.mkString(","))
  }

  /** Remove one table from the session's active set (its decoded
    * generation stays registered for other sessions until evicted).
    */
  def deactivate(spark: SparkSession, dir: String): Unit = {
    val table = SketchCatalog.normalizePath(spark, dir)
    val active = activeEntries(spark.conf.getOption(ConfKey).getOrElse("")) - table
    if (active.isEmpty) spark.conf.unset(ConfKey)
    else spark.conf.set(ConfKey, active.toSeq.sortBy(_._1)
      .map { case (t, g) => s"${encode(t)}~$g" }.mkString(","))
  }

  def deactivateAll(spark: SparkSession): Unit = spark.conf.unset(ConfKey)

  /** table → pinned generation, parsed from the session conf's current
    * value. Legacy entries without a generation (a conf string written by
    * a pre-generation build riding a cloned session) parse to generation
    * -1, which no registry key carries — the rule degrades to no-rewrite
    * rather than guessing another session's decode.
    */
  def activeEntries(confValue: String): Map[String, Long] =
    confValue.split(",").filter(_.nonEmpty).map { e =>
      e.lastIndexOf('~') match {
        case -1 => decode(e) -> -1L
        case i  => decode(e.substring(0, i)) ->
          scala.util.Try(e.substring(i + 1).toLong).getOrElse(-1L)
      }
    }.toMap

  private def lookupGen(table: String, gen: Long): Option[TableArtifacts] =
    Option(indexes.get(genKey(table, gen)))

  /** The artifacts a session pinned for `table`, per its conf value. */
  def lookup(table: String, gen: Long): Option[TableArtifacts] =
    lookupGen(table, gen)
}
