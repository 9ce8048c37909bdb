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

/** Point estimate from a serialized Count-Min sketch: `(sketch, key)` →
  * the sketch's count upper bound for the key (always >= the true count;
  * over by more than eps*N with probability < 1−confidence). Key hashing
  * matches the SQL `count_min_sketch` producer exactly (string keys
  * hashed as their UTF-8 bytes), so estimates read from either producer's
  * artifacts.
  *
  * The sketch operand is typically one broadcast/merged artifact probed
  * by MANY key rows; deserializing per row would dominate, so each thread
  * caches the last decoded sketch and revalidates by byte equality (a
  * memcmp per row — the sketch is KBs-to-MBs; decode only on change).
  * Codegen keeps the call inside whole-stage pipelines via the PqAdc
  * reference-object pattern.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression] {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_cms_estimate expects (binary sketch, string key), got ($l, $r)")
  }

  @transient private lazy val cached =
    new ThreadLocal[(Array[Byte], CountMinSketch)]

  def estimate(bytes: Array[Byte], key: UTF8String): Long = {
    var e = cached.get()
    if (e == null || !java.util.Arrays.equals(e._1, bytes)) {
      e = (bytes, CountMinSketch.readFrom(bytes))
      cached.set(e)
    }
    e._2.estimateCount(key.getBytes)
  }

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
