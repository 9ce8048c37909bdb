package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Merge aggregate over SERIALIZED Count-Min sketches — the missing half
  * of Spark's CMS support: `count_min_sketch(col, eps, conf, seed)` builds
  * a sketch per group, but nothing ships to union stored sketch artifacts
  * back together, which is the whole point of a mergeable sketch (per-day
  * heavy-hitter artifacts persisted once, corpus-to-date counts answered
  * from the store without rescanning history — the [[graft.ops.Sketches]]
  * incremental discipline).
  *
  * Built as a native `TypedImperativeAggregate` over Spark's PUBLIC
  * `org.apache.spark.util.sketch.CountMinSketch` (the exact class the SQL
  * aggregate serializes with, so stored artifacts from either producer
  * merge interchangeably). CMS merge is CELL-WISE ADDITION, so a union of
  * per-group sketches is TABLE-IDENTICAL to one sketch built over the
  * whole feed — estimates agree exactly, whatever the grouping or merge
  * order (the property the incremental read path stands on, asserted by
  * SketchesSpec byte-for-byte). All inputs must share (eps, confidence,
  * seed); incompatible geometries fail the merge loudly rather than
  * degrade estimates.
  *
  * State is ONE sketch (depth x width longs) per aggregation buffer
  * regardless of input volume — the bounded-state contract; partial
  * aggregation ships sketches, not keys, across the exchange.
  */
case class CmsMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cms_merge expects a binary serialized count-min sketch, got $t")
  }

  // null = "no sketch seen yet": the geometry comes from the first input,
  // so an empty group evaluates to null rather than an arbitrary shape
  override def createAggregationBuffer(): CountMinSketch = null

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val sk = CountMinSketch.readFrom(v.asInstanceOf[Array[Byte]])
      if (buffer == null) sk else buffer.mergeInPlace(sk)
    }
  }

  override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch =
    if (b1 == null) b2 else if (b2 == null) b1 else b1.mergeInPlace(b2)

  override def eval(buffer: CountMinSketch): Any =
    if (buffer == null) null else buffer.toByteArray

  override def serialize(buffer: CountMinSketch): Array[Byte] =
    if (buffer == null) Array.emptyByteArray else buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    if (bytes.isEmpty) null else CountMinSketch.readFrom(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeAgg =
    copy(child = newChild)
}

/** Serialization for the Greenwald–Khanna quantile summary behind the
  * quantile-sketch store: [relativeError, count, nStats, (value, g,
  * delta)*] — the summary's entire state, so a reloaded sketch answers
  * queries identically to the one that was stored.
  */
private[graft] object QuantileCodec {
  import org.apache.spark.sql.catalyst.util.QuantileSummaries
  import org.apache.spark.sql.catalyst.util.QuantileSummaries.Stats

  def toBytes(q: QuantileSummaries): Array[Byte] = {
    val c = if (q.compressed) q else q.compress()
    val s = c.sampled
    val bb = java.nio.ByteBuffer.allocate(8 + 8 + 4 + s.length * 24)
    bb.putDouble(c.relativeError).putLong(c.count).putInt(s.length)
    s.foreach(st => bb.putDouble(st.value).putLong(st.g).putLong(st.delta))
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): QuantileSummaries = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val err = bb.getDouble
    val count = bb.getLong
    val stats = Array.fill(bb.getInt)(Stats(bb.getDouble, bb.getLong, bb.getLong))
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, err,
      stats, count, true)
  }
}

/** Quantile-sketch build aggregate — the third leg of the mergeable
  * store trio ([[graft.ops.Sketches]]: HLL answers distincts, CMS
  * frequencies, this answers QUANTILES from stored artifacts): a
  * Greenwald–Khanna summary (the engine inside Spark's own
  * `approx_percentile`) built per group and serialized as a persistable
  * binary column. State ≤ O(1/relativeError) samples per buffer whatever
  * the input volume. Unlike HLL/CMS, GK merge is NOT
  * grouping-invariant — a union of stored sketches is a VALID summary at
  * (2×) the error bound but not bit-identical to the one-shot sketch —
  * so the store's contract is the RANK guarantee, which is exactly what
  * the registered gate asserts in-plan (the x10_anomaly_mad_approx
  * rank-window discipline).
  */
case class QuantileSketchAgg(
    child: Expression,
    relativeError: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.spark.sql.catalyst.util.QuantileSummaries]
  with UnaryLike[Expression] {

  import org.apache.spark.sql.catalyst.util.QuantileSummaries

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (relativeError <= 0 || relativeError >= 1) TypeCheckResult.TypeCheckFailure(
      s"graft_qsketch_agg expects relativeError in (0, 1), got $relativeError")
    else child.dataType match {
      case DoubleType | FloatType | LongType | IntegerType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_qsketch_agg expects a numeric value column, got $t")
    }

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relativeError)

  override def update(buffer: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer
    else buffer.insert(v match {
      case d: java.lang.Double  => d
      case f: java.lang.Float   => f.toDouble
      case l: java.lang.Long    => l.toDouble
      case i: java.lang.Integer => i.toDouble
      case other                => other.toString.toDouble
    })
  }

  override def merge(b1: QuantileSummaries, b2: QuantileSummaries): QuantileSummaries = {
    val c1 = if (b1.compressed) b1 else b1.compress()
    val c2 = if (b2.compressed) b2 else b2.compress()
    if (c2.count == 0) c1 else if (c1.count == 0) c2 else c1.merge(c2)
  }

  override def eval(buffer: QuantileSummaries): Any =
    if (buffer.count == 0) null else QuantileCodec.toBytes(buffer)

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    QuantileCodec.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileCodec.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
}

/** Merge aggregate over SERIALIZED quantile sketches — the union read
  * path for stored per-day/per-source artifacts (the [[CmsMergeAgg]]
  * role for quantiles). The merged summary honors the GK rank bound at
  * the summed error; empty groups merge as identities.
  */
case class QuantileMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.spark.sql.catalyst.util.QuantileSummaries]
  with UnaryLike[Expression] {

  import org.apache.spark.sql.catalyst.util.QuantileSummaries

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_qsketch_merge expects a binary serialized quantile sketch, got $t")
  }

  override def createAggregationBuffer(): QuantileSummaries = null

  override def update(buffer: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val sk = QuantileCodec.fromBytes(v.asInstanceOf[Array[Byte]])
      if (buffer == null || buffer.count == 0) sk
      else if (sk.count == 0) buffer
      else buffer.merge(sk)
    }
  }

  override def merge(b1: QuantileSummaries, b2: QuantileSummaries): QuantileSummaries =
    if (b1 == null || b1.count == 0) b2
    else if (b2 == null || b2.count == 0) b1
    else b1.merge(b2)

  override def eval(buffer: QuantileSummaries): Any =
    if (buffer == null || buffer.count == 0) null else QuantileCodec.toBytes(buffer)

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    if (buffer == null) Array.emptyByteArray else QuantileCodec.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    if (bytes.isEmpty) null else QuantileCodec.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileMergeAgg =
    copy(child = newChild)
}

/** Quantile query against a serialized GK sketch: `(sketch, p)` → the
  * rank-p estimate; decode caching per [[DecodedSketchProbe]].
  */
case class QuantileSketchQuery(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression]
  with DecodedSketchProbe[org.apache.spark.sql.catalyst.util.QuantileSummaries] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_qsketch_query expects (binary sketch, double p), got ($l, $r)")
  }

  override protected def parse(bytes: Array[Byte]) = QuantileCodec.fromBytes(bytes)

  def queryP(bytes: Array[Byte], p: Double): Any =
    decoded(bytes).query(p) match {
      case scala.Some(v) => v
      case _ => null
    }

  override def nullSafeEval(sk: Any, p: Any): Any =
    queryP(sk.asInstanceOf[Array[Byte]], p.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("qsQuery", this, classOf[QuantileSketchQuery].getName)
    val se = left.genCode(ctx)
    val pe = right.genCode(ctx)
    val r = ctx.freshName("qRes")
    ev.copy(code = code"""
      ${se.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = -1.0;
      if (!${se.isNull}) {
        ${pe.code}
        if (!${pe.isNull}) {
          Object $r = $ref.queryP(${se.value}, ${pe.value});
          if ($r != null) {
            ${ev.isNull} = false;
            ${ev.value} = ((Double) $r).doubleValue();
          }
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Inverse-CDF query against a serialized GK sketch: `(sketch, v)` →
  * the estimated rank FRACTION of `v` in [0, 1] — the percentile-rank
  * feature ("where does this row sit within its group?") computed as a
  * pure projection against a stored/broadcast artifact instead of a
  * per-group sort or window. GK's symmetric guarantee covers rank
  * queries too: for the last summary entry with value ≤ v the true
  * rank lies in [rmin, rmin + delta], and the midpoint estimator is
  * within ε·n (2ε·n after a union — the store's documented merge
  * degradation). Values below the sketch minimum rank 0, above the
  * maximum rank 1. Decode caching per [[DecodedSketchProbe]] — the
  * artifact-as-literal hot-path rule applies.
  */
case class QuantileSketchRank(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression]
  with DecodedSketchProbe[org.apache.spark.sql.catalyst.util.QuantileSummaries] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_qsketch_rank expects (binary sketch, double value), got ($l, $r)")
  }

  override protected def parse(bytes: Array[Byte]) = QuantileCodec.fromBytes(bytes)

  def rankOf(bytes: Array[Byte], v: Double): Any = {
    val q = decoded(bytes)
    if (q.count == 0) null
    else {
      val s = q.sampled
      var i = 0
      var rmin = 0L
      var last = -1L // rank estimate of the last entry with value <= v
      while (i < s.length && s(i).value <= v) {
        rmin += s(i).g
        last = rmin + s(i).delta / 2
        i += 1
      }
      if (last < 0) 0.0
      else if (i == s.length) 1.0
      else last.toDouble / q.count
    }
  }

  override def nullSafeEval(sk: Any, v: Any): Any =
    rankOf(sk.asInstanceOf[Array[Byte]], v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("qsRank", this, classOf[QuantileSketchRank].getName)
    val se = left.genCode(ctx)
    val ve = right.genCode(ctx)
    val r = ctx.freshName("rkRes")
    ev.copy(code = code"""
      ${se.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = -1.0;
      if (!${se.isNull}) {
        ${ve.code}
        if (!${ve.isNull}) {
          Object $r = $ref.rankOf(${se.value}, ${ve.value});
          if ($r != null) {
            ${ev.isNull} = false;
            ${ev.value} = ((Double) $r).doubleValue();
          }
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Parsed view of Spark's serialized Count-Min sketch (format V1:
  * int version, long totalCount, int depth, int width, long hashA[depth],
  * long table[depth][width] — big-endian, the exact layout
  * `CountMinSketch.writeTo` produces and `readFrom` consumes). Parsing
  * the ARTIFACT directly is deliberate: the public class hides its
  * table, and the store's native form is these bytes anyway; the layout
  * is pinned by SketchesSpec against sketches the public producer built.
  */
private[graft] final case class CmsParsed(
    depth: Int, width: Int, hashA: Array[Long], table: Array[Long])

private[graft] object CmsCodec {
  def parse(bytes: Array[Byte]): CmsParsed = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val version = bb.getInt
    require(version == 1, s"unsupported count-min sketch serialization version $version")
    bb.getLong // totalCount (recomputable from any table row)
    val depth = bb.getInt
    val width = bb.getInt
    val hashA = Array.fill(depth)(bb.getLong)
    val table = Array.fill(depth * width)(bb.getLong)
    require(!bb.hasRemaining,
      s"count-min sketch payload has ${bb.remaining()} trailing bytes")
    CmsParsed(depth, width, hashA, table)
  }

  /** AMS/CMS inner-product estimate `min_d Σ_w A[d][w]·B[d][w]` — shared
    * by the [[CmsInnerProduct]] expression (in-plan estimation) and the
    * planner rule [[graft.plans.SketchJoinPlanning]] (driver-side join
    * ordering from stored artifacts). Geometry AND seed must match;
    * exact arithmetic — overflow throws, never wraps into a silently
    * wrong "estimate".
    */
  def innerProduct(a: CmsParsed, b: CmsParsed): Long = {
    require(a.depth == b.depth && a.width == b.width,
      s"incompatible count-min geometries: ${a.depth}x${a.width} vs ${b.depth}x${b.width}")
    require(java.util.Arrays.equals(a.hashA, b.hashA),
      "count-min sketches built with different seeds cannot be combined")
    var best = Long.MaxValue
    var d = 0
    while (d < a.depth) {
      var s = 0L
      var j = d * a.width
      val end = j + a.width
      while (j < end) {
        s = Math.addExact(s, Math.multiplyExact(a.table(j), b.table(j)))
        j += 1
      }
      if (s < best) best = s
      d += 1
    }
    best
  }
}

/** Join-cardinality estimate from two serialized Count-Min sketches:
  * `inner(A, B) = min over rows d of Σ_w A[d][w]·B[d][w]` — the
  * AMS/CMS inner-product estimator (Cormode & Muthukrishnan '05, §4.2)
  * of `Σ_k f_A(k)·f_B(k)`, which IS `|A ⋈ B|` on the sketched key. The
  * planner-side use at 100 TB: pick join strategy/order from per-table
  * sketch ARTIFACTS already in the store, touching no data. Guarantee
  * inherited from CMS: the estimate never undercounts, and overshoots
  * `|A⋈B|` by more than eps·N_A·N_B with probability < 1−confidence —
  * which is also the honest limit: the absolute slack scales with
  * N_A·N_B, so a fixed-width store resolves big-join cardinalities
  * only down to that floor (measured crossover in SCALING r10).
  *
  * Sketches must share geometry AND seed (the hashA rows prove the
  * seed); mismatches fail loudly like [[CmsMergeAgg]]. Cell products
  * use exact arithmetic — overflow throws rather than returning a
  * silently wrapped "estimate".
  */
case class CmsInnerProduct(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression]
  with DecodedSketchProbe[CmsParsed] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_cms_inner expects two binary serialized count-min sketches, got ($l, $r)")
  }

  override protected def parse(bytes: Array[Byte]): CmsParsed = CmsCodec.parse(bytes)

  def inner(lb: Array[Byte], rb: Array[Byte]): Long =
    CmsCodec.innerProduct(decoded(lb), CmsCodec.parse(rb))

  override def nullSafeEval(l: Any, r: Any): Any =
    inner(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsInner", this, classOf[CmsInnerProduct].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $ref.inner($l, $r);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Distributed Bloom-filter build over a key column — the build half of
  * the semi-join pruning pattern ([[graft.ops.BloomPrune]]): Spark's
  * runtime row-level filtering injects this only under AQE's cost
  * heuristics; this aggregate makes the technique an explicit, composable
  * operator (and the filter a persistable artifact like the other
  * sketches here). Buffer = ONE fixed-size bit array (`optimalNumOfBits
  * (expectedItems, fpp)`) per aggregation buffer regardless of input
  * volume; merge is bitwise OR. Long keys hash as longs, everything else
  * as its string form — [[BloomContains]] dispatches identically, so
  * build and probe agree. NULL keys are skipped (an equi-join never
  * matches them).
  *
  * Capacity overflow degrades fpp, never correctness: a Bloom filter has
  * false POSITIVES only, and the pruned join re-verifies with the real
  * equi-join — the contract the result-identical oracle gate leans on.
  */
/** THE canonical key hash-class mapping for Bloom build/probe — the one
  * place [[BloomBuildAgg.update]]'s type dispatch is mirrored. Every
  * guard that enforces the build-and-probe-in-one-class contract
  * ([[graft.ops.BloomPrune]], [[graft.ops.DataSkipping]],
  * [[graft.plans.SketchJoinPlanning]]) reads it from here: a change to
  * the aggregate's dispatch that misses a scattered copy reintroduces
  * exactly the cross-class false-negative unsoundness the guards exist
  * to prevent.
  */
object BloomHashClass {
  /** Hash class [[BloomBuildAgg]] puts a key type in (build side). */
  def of(dt: DataType): String = dt match {
    case LongType | IntegerType => "long"
    case _                      => "string"
  }

  /** The class IF [[BloomContains]] can also probe the type — the
    * build∩probe intersection planners must stay inside.
    */
  def probeable(dt: DataType): Option[String] = dt match {
    case LongType | IntegerType => Some("long")
    case StringType             => Some("string")
    case _                      => None
  }
}

/** Merge of serialized Bloom filters — bitwise OR of the bit arrays
  * ([[org.apache.spark.util.sketch.BloomFilter.mergeInPlace]]): the
  * Bloom of a UNION of key sets is exactly the OR of the sets' Blooms,
  * so per-file index artifacts fold across file rewrites
  * ([[graft.ops.DataSkipping.bloomIndexAfterCompaction]]) with no
  * re-scan and BIT-IDENTICAL results to a rebuild. All inputs must
  * share geometry (expectedItems, fpp at build) — `mergeInPlace`
  * rejects incompatible sizes loudly. Null/empty groups evaluate null,
  * the [[CmsMergeAgg]] convention.
  */
case class BloomMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.spark.util.sketch.BloomFilter]
  with UnaryLike[Expression] {

  import org.apache.spark.util.sketch.BloomFilter

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_merge expects a binary serialized bloom filter, got $t")
  }

  override def createAggregationBuffer(): BloomFilter = null

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val bf = BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
      if (buffer == null) bf else buffer.mergeInPlace(bf)
    }
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter =
    if (b1 == null) b2 else if (b2 == null) b1 else b1.mergeInPlace(b2)

  private def toBytes(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  override def eval(buffer: BloomFilter): Any =
    if (buffer == null) null else toBytes(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] =
    if (buffer == null) Array.emptyByteArray else toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    if (bytes.isEmpty) null
    else BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomMergeAgg =
    copy(child = newChild)
}

case class BloomBuildAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.spark.util.sketch.BloomFilter]
  with UnaryLike[Expression] {

  import org.apache.spark.util.sketch.BloomFilter

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (expectedItems <= 0) TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_agg expects a positive expected-item count, got $expectedItems")
    else if (fpp <= 0 || fpp >= 1) TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_agg expects fpp in (0, 1), got $fpp")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType    => buffer.putLong(v.asInstanceOf[Long])
      case IntegerType => buffer.putLong(v.asInstanceOf[Int].toLong)
      case _           => buffer.putString(v.toString)
    }
    buffer
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter =
    b1.mergeInPlace(b2)

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
}

/** Per-instance decode cache for scalar sketch probes. The probe shape is
  * ONE artifact tested by MANY rows, so the artifact must be decoded once,
  * not per row. Two regimes, chosen by foldability:
  *
  *  - FOLDABLE sketch operand (the operators' own form — the bounded
  *    artifact is collected and embedded as a literal, the PqAdc codebook
  *    discipline): decoded exactly once per expression instance, zero
  *    per-row validation cost.
  *  - non-foldable operand (a user joins the sketch in as a column):
  *    per-thread cache revalidated by byte equality. The memcmp is
  *    O(artifact size) PER ROW — measured 138× wall on a 60M-row probe of
  *    a 1.2 MB filter (SCALING r10), because a row-materialized binary is
  *    a fresh array every access and identity never matches. Correct, but
  *    a hot path should use the literal form.
  */
private[functions] trait DecodedSketchProbe[S >: Null <: AnyRef] {
  self: BinaryExpression =>

  protected def parse(bytes: Array[Byte]): S

  @transient private lazy val foldableDecoded: S =
    if (left.foldable) {
      val v = left.eval()
      if (v == null) null else parse(v.asInstanceOf[Array[Byte]])
    } else null

  @transient private lazy val threadCache = new ThreadLocal[(Array[Byte], S)]

  protected final def decoded(bytes: Array[Byte]): S = {
    val f = foldableDecoded
    if (f != null) f
    else {
      var e = threadCache.get()
      if (e == null || !java.util.Arrays.equals(e._1, bytes)) {
        e = (bytes, parse(bytes))
        threadCache.set(e)
      }
      e._2
    }
  }
}

/** Membership probe against a serialized Bloom filter: `(filter, key)` →
  * might-contain. Key hashing mirrors [[BloomBuildAgg]] (longs as longs,
  * other types as strings); decode caching per [[DecodedSketchProbe]].
  */
case class BloomContains(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression]
  with DecodedSketchProbe[org.apache.spark.util.sketch.BloomFilter] {

  import org.apache.spark.util.sketch.BloomFilter

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType | IntegerType | StringType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains expects (binary filter, bigint|int|string key), got ($l, $r)")
  }

  override protected def parse(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(bytes)

  private def decode(bytes: Array[Byte]): BloomFilter = decoded(bytes)

  // primitive overloads so generated code never relies on Janino autoboxing
  def contains(bytes: Array[Byte], key: Long): Boolean =
    decode(bytes).mightContainLong(key)
  def contains(bytes: Array[Byte], key: Int): Boolean =
    decode(bytes).mightContainLong(key.toLong)
  def contains(bytes: Array[Byte], key: UTF8String): Boolean =
    decode(bytes).mightContainString(key.toString)

  override def nullSafeEval(bf: Any, key: Any): Any = {
    val bytes = bf.asInstanceOf[Array[Byte]]
    right.dataType match {
      case LongType    => contains(bytes, key.asInstanceOf[Long])
      case IntegerType => contains(bytes, key.asInstanceOf[Int])
      case _           => contains(bytes, key.asInstanceOf[UTF8String])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomHas", this, classOf[BloomContains].getName)
    nullSafeCodeGen(ctx, ev, (bf, key) =>
      s"${ev.value} = $ref.contains($bf, $key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Point estimate from a serialized Count-Min sketch: `(sketch, key)` →
  * the sketch's count upper bound for the key (always >= the true count;
  * over by more than eps*N with probability < 1−confidence). Key hashing
  * matches the SQL `count_min_sketch` producer exactly (string keys
  * hashed as their UTF-8 bytes), so estimates read from either producer's
  * artifacts.
  *
  * The sketch operand is typically one merged artifact probed by MANY key
  * rows; decode caching per [[DecodedSketchProbe]] (pass the artifact as
  * a LITERAL on hot paths). Codegen keeps the call inside whole-stage
  * pipelines via the PqAdc reference-object pattern.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression]
  with DecodedSketchProbe[CountMinSketch] {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_cms_estimate expects (binary sketch, string key), got ($l, $r)")
  }

  override protected def parse(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(bytes)

  def estimate(bytes: Array[Byte], key: UTF8String): Long =
    decoded(bytes).estimateCount(key.getBytes)

  override def nullSafeEval(sk: Any, key: Any): Any =
    estimate(sk.asInstanceOf[Array[Byte]], key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsEst", this, classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, (sk, key) => s"${ev.value} = $ref.estimate($sk, $key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
