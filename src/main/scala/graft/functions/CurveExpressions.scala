package graft.functions

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
