package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Hilbert-curve index of a 2-d cell: `(x, y)` ranks in [0, 2^bits) →
  * the cell's position along the order-`bits` Hilbert curve — the
  * locality-superior alternative to the Morton/Z interleave
  * ([[graft.ops.Layout.interleave]]): every curve step moves to a GRID
  * NEIGHBOR (no Z-curve diagonal jumps), so an axis-aligned box cuts
  * the curve into fewer runs → fewer boundary files for the same file
  * count (measured against Morton in SCALING r10; the property itself
  * — consecutive indices are Manhattan-distance-1 cells — is
  * spec-pinned exhaustively at order 5).
  *
  * The standard xy2d bit descent (Hamilton's convention, the n−1−x
  * flip form): per level s = 2^(bits−1)..1, quadrant digit
  * (3·rx) XOR ry weighted s², then the lower bits rotate/reflect. A
  * sequential 21-step mutation — exactly what a native kernel does
  * better than 21 chained projections: one static JIT-able loop (the
  * JaroWinkler/PqAdc discipline), bit-replayable in the oracle as an
  * unrolled CTE chain because every step is integer CASE arithmetic.
  *
  * Scaladoc lineage: generalizes the reference's single-column layout
  * implied by sequential cache scans (`/root/reference/cache.js:17-24`)
  * the same way X9z does; Spark-side the index is a pure projection —
  * the write stays `repartitionByRange(hval)` + sort, one exchange.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression with BinaryLike[Expression] {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (bits < 1 || bits > 31) TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert expects bits in [1, 31], got $bits")
    else (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert expects two bigint rank columns, got ($l, $r)")
    }

  def hilbert(x0: Long, y0: Long): Long = {
    val n1 = (1L << bits) - 1L // the n−1 reflection constant
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n1 - x; y = n1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override def nullSafeEval(xv: Any, yv: Any): Any =
    hilbert(xv.asInstanceOf[Long], yv.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hilbertIdx", this, classOf[HilbertIndex].getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $ref.hilbert($x, $y);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** d-dimensional Hilbert-curve index — the general form of
  * [[HilbertIndex]] for layouts clustering THREE or more columns
  * (production OPTIMIZE ZORDER takes 3+ routinely; 2-D was the only
  * arity the r10 expression served). `coords` are per-dimension ranks in
  * [0, 2^bits); the result is the cell's position along the order-`bits`
  * d-dimensional Hilbert curve in [0, 2^(d·bits)).
  *
  * Algorithm: Skilling's transpose form (J. Skilling, "Programming the
  * Hilbert curve", AIP Conf. Proc. 707, 2004 — the standard
  * dimension-generic formulation): an in-place inverse-undo sweep from
  * the top bit plane down turns axes into "transpose" format, a Gray
  * correction aligns the planes, and the index is the bit interleave of
  * the transposed words (dimension 0 most significant within each
  * plane). Every step is integer shift/mask/xor CASE arithmetic, so the
  * oracle twin replays it bit-for-bit as an unrolled CTE chain exactly
  * like the 2-D descent. Same native-kernel rationale as
  * [[HilbertIndex]]: one static JIT-able loop beats (d·bits) chained
  * projections.
  *
  * NOTE the 2-D special case of Skilling's convention is a reflected/
  * rotated variant of [[HilbertIndex]]'s Hamilton xy2d — same locality
  * class (consecutive indices are grid neighbors, spec-pinned
  * exhaustively), different vertex orientation; the two curves are not
  * bit-compatible and a table must be laid out by one of them.
  */
case class HilbertIndexNd(override val children: Seq[Expression], bits: Int)
  extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2) TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert_nd expects at least 2 rank columns, got ${children.size}")
    else if (bits < 1 || bits.toLong * children.size > 63) TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert_nd expects bits >= 1 with bits*dims <= 63, got " +
        s"bits=$bits dims=${children.size}")
    else children.map(_.dataType).find(_ != LongType) match {
      case Some(t) => TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert_nd expects bigint rank columns, got $t")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  /** Skilling AxesToTranspose + interleave. `xs` is a fresh per-row array
    * (mutated in place).
    */
  def hilbert(xs: Array[Long]): Long = {
    val n = xs.length
    // inverse undo: top plane down to q=2
    var q = 1L << (bits - 1)
    while (q > 1L) {
      val p = q - 1L
      var i = 0
      while (i < n) {
        if ((xs(i) & q) != 0L) xs(0) ^= p // invert low bits of axis 0
        else { val t = (xs(0) ^ xs(i)) & p; xs(0) ^= t; xs(i) ^= t } // exchange
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { xs(i) ^= xs(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1L) {
      if ((xs(n - 1) & q) != 0L) t ^= q - 1L
      q >>= 1
    }
    i = 0
    while (i < n) { xs(i) ^= t; i += 1 }
    // interleave transposed words: plane b contributes n bits, dimension 0
    // most significant within the plane
    var d = 0L
    var b = bits - 1
    while (b >= 0) {
      i = 0
      while (i < n) {
        d = (d << 1) | ((xs(i) >>> b) & 1L)
        i += 1
      }
      b -= 1
    }
    d
  }

  override def eval(input: InternalRow): Any = {
    val xs = new Array[Long](children.size)
    var i = 0
    while (i < xs.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    hilbert(xs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("hilbertNd", this, classOf[HilbertIndexNd].getName)
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("coords")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val anyNull = evals.map(_.isNull.toString).mkString(" || ")
    val values = evals.map(_.value.toString).mkString(", ")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = -1L;
      if (!${ev.isNull}) {
        long[] $arr = new long[]{$values};
        ${ev.value} = $ref.hilbert($arr);
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
