package graft.plans

import graft.ops.ScanPrune
import graft.ops.ScanPrune.{ColStats, FileCtx, FileStats, Kind, KBytes, KDecimal, KDouble, KLong, TableArtifacts}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The SCAN side of the artifact-driven planner loop: when a stats
  * manifest is activated for a table ([[ScanPrune.activateManifest]]),
  * this rule rewrites `Filter(pred, scan(table))` so the scan lists only
  * the files whose footer-derived (min, max, nulls) stats admit the
  * predicate — a plain `spark.read.parquet(t).where(user_id = k AND day
  * BETWEEN …)` prunes files exactly as a hand-invoked
  * [[graft.ops.DataSkipping.prunedRead]] would, with zero call-site
  * changes. At 100 TB the scan IS the query: parquet prunes row groups
  * only after a task is scheduled and the footer fetched, so a 1M-file
  * table pays a task per file unless the PLANNER stops listing them.
  *
  * Supported predicate modalities (the gated [[graft.ops.DataSkipping]]
  * set): range and point comparisons on integral / floating / string /
  * timestamp / date / decimal columns, IN-lists and general OR-of-atoms
  * (union of candidates), IS NULL / IS NOT NULL (null counts), and
  * AND-conjunctions (intersection). Unsupported conjuncts contribute no
  * pruning and stay in the Filter — which is never removed, so the
  * rewrite can only drop files the predicate provably cannot match:
  *
  *  - known stats → exact interval test per conjunct (strict bounds
  *    honored: `a > v` keeps a file only when `max > v`);
  *  - unknown stats → candidate, unless the null count proves the file
  *    all-null for a compared column (NULL satisfies no comparison);
  *  - files ABSENT from the manifest → always kept (the rewrite removes
  *    a proven-impossible DROP set from the live listing rather than
  *    imposing a keep list, so a manifest that predates an append
  *    under-prunes instead of losing rows).
  *
  * Mechanically the rewrite swaps the relation's [[FileIndex]] for a
  * [[PrunedFileIndex]] wrapper that filters the listing — Catalyst's own
  * partition pruning, pushed filters, row-group pruning and whole-stage
  * codegen all still apply downstream, because the plan shape is
  * unchanged. Activation is per-session and explicit; without activated
  * tables the rule is inert.
  */
object ScanPruneRewrite extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val active = ScanPrune.activeEntries(
      conf.getConfString(ScanPrune.ConfKey, ""))
    if (active.isEmpty) plan
    else plan.transformUp {
      case f @ Filter(cond, lr: LogicalRelation) =>
        val rewritten = for {
          fs <- lr.relation match {
            case h: HadoopFsRelation if h.location.rootPaths.size == 1 &&
                !h.location.isInstanceOf[PrunedFileIndex] => Some(h)
            case _ => None
          }
          table = fs.location.rootPaths.head.toString
          gen <- active.get(table)
          arts <- ScanPrune.lookup(table, gen)
          drop <- droppedFiles(cond, arts)
          if drop.nonEmpty
        } yield {
          logInfo(s"scan pruning: dropping ${drop.size} of " +
            s"${arts.universe.size} artifact-covered files from $table")
          f.copy(child = lr.copy(relation =
            fs.copy(location = new PrunedFileIndex(fs.location, drop))(
              fs.sparkSession)))
        }
        rewritten.getOrElse(f)
    }
  }

  /** Survival of one file under the conjunct tests, at the finest
    * activated grain (r14): the file-grain conjunction as before, AND —
    * when the manifest was row-group grain — SOME row group must admit
    * every conjunct. Sound because a surviving row lives in exactly one
    * row group and must satisfy the whole conjunction there; strictly
    * stronger than file grain (a box can overlap the file's folded range
    * while missing every group — the band-gap layout). Bloom tests are
    * per-file and simply re-pass per group. Shared with
    * [[DynamicFilePruning]] so the two listing-surgery paths cannot
    * disagree on grain.
    */
  private[plans] def fileSurvives(fc: FileCtx, tests: Seq[Test]): Boolean =
    tests.forall(_(fc)) && (fc.rowGroups.isEmpty ||
      fc.rowGroups.exists(g =>
        tests.forall(_(fc.copy(stats = Some(g), rowGroups = Nil)))))

  /** Canonical paths of artifact-covered files the predicate PROVABLY
    * cannot match; None when no conjunct is priceable against any
    * activated artifact.
    */
  private def droppedFiles(cond: Expression, arts: TableArtifacts)
    : Option[Set[String]] = {
    val tests = splitConjunctivePredicates(cond).flatMap(atomTest(_, arts))
    if (tests.isEmpty) None
    else Some(arts.universe.iterator
      .filterNot(fc => fileSurvives(fc, tests))
      .map(_.path).toSet)
  }

  /** The manifest comparison space of a scan attribute's type (must agree
    * with the manifest column's own Kind or the atom is declined).
    */
  private def attrKind(dt: DataType): Option[Kind] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some(KLong)
    case FloatType | DoubleType                        => Some(KDouble)
    case StringType                                    => Some(KBytes)
    case TimestampType | TimestampNTZType              => Some(KLong)
    case DateType                                      => Some(KLong)
    case _: DecimalType                                => Some(KDecimal)
    case _                                             => None
  }

  /** A literal's internal value normalized to its Kind's comparable form;
    * None declines the atom (null literal — three-valued comparisons
    * never pass rows — or a NaN, whose footer-stats behavior across
    * writers is not a contract worth trusting).
    */
  private def litValue(v: Any, dt: DataType): Option[Any] =
    if (v == null) None
    else dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(v.asInstanceOf[Number].longValue())
      case FloatType =>
        val d = v.asInstanceOf[Float].toDouble
        if (d.isNaN) None else Some(if (d == 0.0) 0.0 else d) // -0.0 ≡ 0.0 in SQL
      case DoubleType =>
        val d = v.asInstanceOf[Double]
        if (d.isNaN) None else Some(if (d == 0.0) 0.0 else d)
      case StringType => Some(v.asInstanceOf[UTF8String].getBytes.clone())
      case TimestampType | TimestampNTZType => Some(v.asInstanceOf[Long])
      case DateType => Some(v.asInstanceOf[Int].toLong)
      case _: DecimalType => Some(v.asInstanceOf[Decimal].toJavaBigDecimal)
      case _ => None
    }

  /** The attribute under an optional STRICTLY WIDENING cast —
    * order-preserving and injective (int → long, float → double), so a
    * comparison in the cast's space prices exactly against the
    * manifest's (which already stores integrals as long and floats as
    * double). Strictness matters: a NARROWING cast (long → int) WRAPS
    * under non-ANSI semantics — `cast(k AS INT) = 5` can match a row
    * whose k is 2^32 + 5, which sits nowhere near 5 in the manifest's
    * long space — so unwrapping it would drop files holding matches.
    */
  private def intWidth(dt: DataType): Int = dt match {
    case ByteType => 1; case ShortType => 2; case IntegerType => 4
    case LongType => 8; case _ => 0
  }

  private def stripWidening(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference => Some(a)
    case c: Cast => (c.child, c.child.dataType, c.dataType) match {
      case (a: AttributeReference, f, t)
          if intWidth(f) > 0 && intWidth(t) > intWidth(f) => Some(a)
      case (a: AttributeReference, FloatType, DoubleType) => Some(a)
      case _ => None
    }
    case _ => None
  }

  private[plans] type Test = FileCtx => Boolean

  /** Interval test against one column's stats: known bounds run `op`;
    * unknown bounds keep the file unless the null count proves it
    * all-null for the column (NULL satisfies no comparison). A file
    * without manifest stats, or a column the manifest does not carry,
    * keeps the file.
    */
  private def statTest(colName: String, op: (ColStats) => Boolean): Test =
    fc => fc.stats.forall(fs => fs.cols.get(colName) match {
      case None => true
      case Some(cs) =>
        if (cs.min != null && cs.max != null) op(cs)
        else !cs.nulls.contains(fs.nRows)
    })

  /** Bloom membership test for one EQUALITY key on `colName` — the
    * modality min/max cannot serve on scattered columns: a file whose
    * filter says the key is absent is PROVABLY impossible (false
    * positives only); unindexed files keep. Declined unless the probe
    * value hashes in the index's recorded build class (a cross-class
    * probe is false-negative-unsound — the candidateFilesByKey
    * contract).
    */
  private def bloomTest(arts: TableArtifacts, colName: String, dt: DataType,
                        v: Any): Option[Test] =
    for {
      bi <- arts.blooms.get(colName)
      probeCls <- graft.functions.BloomHashClass.probeable(dt)
      if probeCls == bi.keyClass
      key <- Option(v)
    } yield (fc: FileCtx) => fc.fileBlooms.get(colName) match {
      case None => true
      case Some(bf) => probeCls match {
        case "long" => bf.mightContainLong(key.asInstanceOf[Number].longValue())
        case _      => bf.mightContainString(key.toString)
      }
    }

  /** Compile `attrExpr ⊙ literal` into a file test (None = declined):
    * the manifest interval test where the column is manifested, AND the
    * Bloom membership test for EQUALITY atoms on indexed columns — both
    * sound alone, so their conjunction is.
    */
  private def cmpTest(attrExpr: Expression, v: Any, dt: DataType,
                      arts: TableArtifacts,
                      op: (Kind, ColStats, Any) => Boolean): Option[Test] = {
    val manifestT = for {
      a <- stripWidening(attrExpr)
      kind <- attrKind(a.dataType)
      mkind <- arts.kinds.get(a.name)
      if kind == mkind
      value <- litValue(v, dt)
    } yield statTest(a.name, cs => op(kind, cs, value))
    val bloomT =
      if (op ne eqOp) None
      else stripWidening(attrExpr).flatMap(a => bloomTest(arts, a.name, dt, v))
    (manifestT, bloomT) match {
      case (Some(m), Some(b)) => Some(fc => m(fc) && b(fc))
      case (m, b)             => m.orElse(b)
    }
  }

  /** Plan-time pricing caps for point SETS (IN-lists and the dynamic
    * file-pruning pass's collected build keys). `MaxPricedPoints` bounds
    * the one-off normalize+sort (a 10k-key IN over a 1M-file manifest
    * used to cost ~10^10 per-literal interval tests; sorted, each file
    * is one O(log n) probe). `BloomPointProbeBudget` bounds the Bloom
    * modality's worst case — a file containing NO point pays one probe
    * per value, so dropped files cost |values| probes each; past the
    * budget the Bloom part is declined (sound: less pruning, never
    * wrong) while the interval part still prices.
    */
  private[plans] val MaxPricedPoints = 1 << 16
  private[plans] val BloomPointProbeBudget = 64L << 20

  /** Admission test for a SET of equality points on one column, built
    * once per atom: values normalize and sort once; per file the
    * interval modality binary-searches for any value inside the file's
    * [min, max] and the Bloom modality short-circuits on the first
    * might-contain hit. The two modalities combine conjunctively at SET
    * grain — a file survives when some value fits its interval AND some
    * value is Bloom-positive — marginally weaker than the per-value
    * conjunction (which would require one value passing both) but sound,
    * and what keeps each file O(log |values|) instead of O(|values|).
    * None = declined: no priceable modality, an unreadable non-null
    * value (a missing point could match anything), or past the caps.
    */
  private[plans] def pointSetTest(arts: TableArtifacts, attrExpr: Expression,
                                  values: Seq[(Any, DataType)]): Option[Test] = {
    val nonNull = values.filter(_._1 != null)
    if (nonNull.isEmpty || nonNull.size > MaxPricedPoints) return None
    stripWidening(attrExpr).flatMap { a =>
      val manifestT: Option[Test] = for {
        kind <- attrKind(a.dataType)
        mkind <- arts.kinds.get(a.name)
        if kind == mkind
        normed <- {
          val ns = nonNull.map { case (v, dt) => litValue(v, dt) }
          if (ns.exists(_.isEmpty)) None else Some(ns.map(_.get))
        }
      } yield {
        val sorted = normed.toArray[Any]
        java.util.Arrays.sort(sorted.asInstanceOf[Array[Object]],
          ((x: Any, y: Any) => ScanPrune.cmp(kind, x, y)): java.util.Comparator[Any])
        statTest(a.name, cs => anySortedInRange(kind, sorted, cs))
      }
      val bloomT: Option[Test] = for {
        bi <- arts.blooms.get(a.name)
        classes = nonNull.map { case (_, dt) =>
          graft.functions.BloomHashClass.probeable(dt) }.distinct
        if classes == Seq(Some(bi.keyClass))
        if nonNull.size.toLong * math.max(1L, arts.universe.size.toLong) <=
          BloomPointProbeBudget
      } yield (fc: FileCtx) => fc.fileBlooms.get(a.name) match {
        case None => true
        case Some(bf) => nonNull.exists { case (v, _) => bi.keyClass match {
          case "long" => bf.mightContainLong(v.asInstanceOf[Number].longValue())
          case _      => bf.mightContainString(v.toString)
        }}
      }
      (manifestT, bloomT) match {
        case (Some(m), Some(b)) => Some((fc: FileCtx) => m(fc) && b(fc))
        case (m, b)             => m.orElse(b)
      }
    }
  }

  /** Does any element of `sorted` (ascending in `kind`'s order) fall in
    * [cs.min, cs.max]? Binary search for the first element ≥ min, then
    * one compare against max.
    */
  private def anySortedInRange(kind: Kind, sorted: Array[Any], cs: ColStats): Boolean = {
    var lo = 0; var hi = sorted.length // first idx with elem >= cs.min
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ScanPrune.cmp(kind, sorted(mid), cs.min) < 0) lo = mid + 1 else hi = mid
    }
    lo < sorted.length && ScanPrune.cmp(kind, sorted(lo), cs.max) <= 0
  }

  private val ge: (Kind, ColStats, Any) => Boolean =
    (k, cs, v) => ScanPrune.cmp(k, cs.max, v) >= 0
  private val gt: (Kind, ColStats, Any) => Boolean =
    (k, cs, v) => ScanPrune.cmp(k, cs.max, v) > 0
  private val le: (Kind, ColStats, Any) => Boolean =
    (k, cs, v) => ScanPrune.cmp(k, cs.min, v) <= 0
  private val lt: (Kind, ColStats, Any) => Boolean =
    (k, cs, v) => ScanPrune.cmp(k, cs.min, v) < 0
  private val eqOp: (Kind, ColStats, Any) => Boolean =
    (k, cs, v) => ScanPrune.cmp(k, cs.min, v) <= 0 && ScanPrune.cmp(k, cs.max, v) >= 0

  /** One predicate atom compiled to a file test; None = unsupported (the
    * conjunct then contributes no pruning — sound, never lucky).
    * `private[plans]`: [[SketchJoinPlanning]] reuses the compiled tests
    * to SUM surviving manifested rows into a Filter row bound (the range
    * modality its CMS point bounds cannot price), so the two consumers
    * cannot disagree on what a predicate admits.
    */
  private[plans] def atomTest(e: Expression, arts: TableArtifacts): Option[Test] = e match {
    case GreaterThanOrEqual(l, Literal(v, dt)) => cmpTest(l, v, dt, arts, ge)
    case GreaterThanOrEqual(Literal(v, dt), r) => cmpTest(r, v, dt, arts, le)
    case GreaterThan(l, Literal(v, dt))        => cmpTest(l, v, dt, arts, gt)
    case GreaterThan(Literal(v, dt), r)        => cmpTest(r, v, dt, arts, lt)
    case LessThanOrEqual(l, Literal(v, dt))    => cmpTest(l, v, dt, arts, le)
    case LessThanOrEqual(Literal(v, dt), r)    => cmpTest(r, v, dt, arts, ge)
    case LessThan(l, Literal(v, dt))           => cmpTest(l, v, dt, arts, lt)
    case LessThan(Literal(v, dt), r)           => cmpTest(r, v, dt, arts, gt)
    case EqualTo(l, Literal(v, dt))            => cmpTest(l, v, dt, arts, eqOp)
    case EqualTo(Literal(v, dt), r)            => cmpTest(r, v, dt, arts, eqOp)
    case EqualNullSafe(l, lit @ Literal(v, dt)) if v != null =>
      cmpTest(l, v, dt, arts, eqOp)
    case EqualNullSafe(lit @ Literal(v, dt), r) if v != null =>
      cmpTest(r, v, dt, arts, eqOp)
    case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      // union of point intervals (the candidateFilesAny modality), priced
      // as ONE sorted set: O(log |values|) per file, capped — null
      // elements drop from the set (NULL = x passes no Filter row)
      pointSetTest(arts, a, vs.map { case Literal(v, dt) => (v, dt) })
    case InSet(a, vs) if vs.nonEmpty =>
      pointSetTest(arts, a, vs.toSeq.map(v => (v, a.dataType)))
    case IsNull(e1) =>
      stripWidening(e1).filter(a => arts.kinds.contains(a.name)).map { a =>
        // exact per file: zero nulls has nothing for IS NULL
        fc => fc.stats.forall(_.cols.get(a.name).forall(_.nulls.forall(_ > 0L)))
      }
    case IsNotNull(e1) =>
      stripWidening(e1).filter(a => arts.kinds.contains(a.name)).map { a =>
        fc => fc.stats.forall(fs =>
          fs.cols.get(a.name).forall(_.nulls.forall(_ < fs.nRows)))
      }
    case Or(x, y) =>
      // union of candidates: a file survives when EITHER branch admits it
      for { tx <- atomTest(x, arts); ty <- atomTest(y, arts) }
        yield (fc: FileCtx) => tx(fc) || ty(fc)
    case And(x, y) => // nested AND under an OR branch
      for { tx <- atomTest(x, arts); ty <- atomTest(y, arts) }
        yield (fc: FileCtx) => tx(fc) && ty(fc)
    case _ => None
  }
}

/** A [[FileIndex]] view with a proven-impossible DROP set subtracted from
  * every listing: files outside the set — including files the manifest
  * never saw — pass through untouched, so staleness can only under-prune.
  * Partition values, metadata columns and the listing contract are the
  * underlying index's own; `sizeInBytes` re-sums the surviving files so
  * downstream size-based planning sees the pruned scan's real bytes.
  */
final class PrunedFileIndex(val underlying: FileIndex,
                            droppedCanonical: Set[String]) extends FileIndex {

  private def keep(p: Path): Boolean =
    !droppedCanonical.contains(p.toUri.getPath)

  override def rootPaths: Seq[Path] = underlying.rootPaths

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    underlying.listFiles(partitionFilters, dataFilters)
      .map(pd => pd.copy(files = pd.files.filter(f => keep(f.getPath))))
      .filter(_.files.nonEmpty)

  override def inputFiles: Array[String] =
    underlying.inputFiles.filter(s => keep(new Path(s)))

  override def refresh(): Unit = underlying.refresh()

  override lazy val sizeInBytes: Long =
    listFiles(Nil, Nil).iterator.flatMap(_.files).map(_.getLen).sum

  override def partitionSchema: StructType = underlying.partitionSchema

  override def metadataOpsTimeNs: Option[Long] = underlying.metadataOpsTimeNs

  override def toString: String =
    s"PrunedFileIndex(${droppedCanonical.size} dropped, $underlying)"
}
