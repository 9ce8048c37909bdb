package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Expand, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite naive Hamming-distance theta-joins into the
  * banded pigeonhole equi-join.
  *
  * A user who wants near-duplicate pairs writes the declarative form
  *
  * {{{ a.join(b, bit_count(a("h") ^ b("h")) <= lit(3)) }}}
  *
  * which Spark can only plan as BroadcastNestedLoopJoin / CartesianProduct
  * — O(|a|·|b|) comparisons, the exact plan that dies at corpus scale and
  * that every fingerprint operator here avoids by hand via
  * [[graft.ops.Dedup.hamming64NearDupPairs]]. This rule teaches the
  * OPTIMIZER the same trick, so the naive form gets the scale-safe plan
  * transparently:
  *
  *  - split the 64-bit key into k+1 contiguous chunks (floor boundaries).
  *    By pigeonhole, two keys within Hamming distance k agree on at least
  *    one whole chunk — recall is exactly 1;
  *  - Expand each side into k+1 rows tagged (band index, chunk value) —
  *    ONE scan per side, the same node cube/rollup use;
  *  - equi-join on (band, chunk): Catalyst now sees join keys and plans a
  *    hash join, shuffling 12-byte tags instead of pairing all rows;
  *  - keep the ORIGINAL predicate as the exact verification filter, and
  *    add the first-agreeing-band guard (∀ j < band: chunk_j(x) ≠
  *    chunk_j(y)) so every qualifying pair survives EXACTLY once —
  *    multiplicity, including duplicate input rows, matches the naive
  *    join bit-for-bit.
  *
  * Scope guards: inner joins only; the bound must be a foldable
  * non-negative integer ≤ 15 (beyond 16 bands the chunks thin below 4
  * bits and the candidate volume approaches all-pairs anyway); both xor
  * operands must be LongType and split cleanly across the two sides. Any
  * other conjuncts in the join condition ride along unchanged. The rule
  * skips plans it already rewrote (marker attribute prefix), so it is
  * fixpoint-safe.
  */
object HammingJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val Marker = "__graft_hband"
  private val MaxBound = 15

  /** bound k from `bit_count(xor) <= k`-shaped conjuncts; handles both
    * orientations, strict forms, and an integral cast around bit_count.
    */
  private object HammingBound {
    private def bc(e: Expression): Option[Expression] = e match {
      case BitwiseCount(BitwiseXor(x, y)) => Some(BitwiseXor(x, y))
      case Cast(inner, t, _, _) if t == IntegerType || t == LongType => bc(inner)
      case _ => None
    }
    private def lit(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case Literal(v: Long, LongType) if v.isValidInt => Some(v.toInt)
      case Cast(inner, _, _, _) => lit(inner)
      case _ => None
    }
    /** Returns (xorExpr, inclusiveBound). */
    def unapply(e: Expression): Option[(BitwiseXor, Int)] = e match {
      case LessThanOrEqual(l, r) => for (x <- bc(l); k <- lit(r)) yield (x.asInstanceOf[BitwiseXor], k)
      case GreaterThanOrEqual(l, r) => for (k <- lit(l); x <- bc(r)) yield (x.asInstanceOf[BitwiseXor], k)
      case LessThan(l, r) => for (x <- bc(l); k <- lit(r)) yield (x.asInstanceOf[BitwiseXor], k - 1)
      case GreaterThan(l, r) => for (k <- lit(l); x <- bc(r)) yield (x.asInstanceOf[BitwiseXor], k - 1)
      case _ => None
    }
  }

  /** Chunk j of [0, bands): bits [j·64/bands, (j+1)·64/bands) of `e`. */
  private def chunk(e: Expression, j: Int, bands: Int): Expression = {
    val lo = j * 64 / bands
    val width = (j + 1) * 64 / bands - lo
    val mask = if (width == 64) -1L else (1L << width) - 1L
    BitwiseAnd(ShiftRightUnsigned(e, Literal(lo)), Literal(mask))
  }

  private def expandSide(plan: LogicalPlan, key: Expression, bands: Int,
                         iAttr: AttributeReference, cAttr: AttributeReference): Expand = {
    val projections = (0 until bands).map { j =>
      plan.output :+ Literal(j) :+ chunk(key, j, bands)
    }
    Expand(projections, plan.output :+ iAttr :+ cAttr, plan)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved &&
          !left.output.exists(_.name.startsWith(Marker)) &&
          !right.output.exists(_.name.startsWith(Marker)) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // rescue ONLY joins that would otherwise pair all rows: if the
      // condition already carries an equi conjunct across the sides (e.g.
      // a hand-banded chunk join whose bit_count verification filter was
      // pushed into the join), Catalyst has join keys and re-banding would
      // stack a second expansion on an already-keyed plan
      val hasEquiKey = conjuncts.exists {
        case EqualTo(l, r) => crossSides(l, r, left, right)
        case EqualNullSafe(l, r) => crossSides(l, r, left, right)
        case _ => false
      }
      val candidate = if (hasEquiKey) None else conjuncts.collectFirst {
        case HammingBound(xorE, k)
            if k >= 0 && k <= MaxBound && xorE.left.dataType == LongType &&
              sidesSplit(xorE, left, right).isDefined =>
          (xorE, k)
      }
      candidate match {
        case None => j
        case Some((xorE, k)) =>
          val Some((x, y)) = sidesSplit(xorE, left, right)
          val bands = k + 1
          val iL = AttributeReference(s"${Marker}_il", IntegerType, nullable = false)()
          val cL = AttributeReference(s"${Marker}_cl", LongType, nullable = x.nullable)()
          val iR = AttributeReference(s"${Marker}_ir", IntegerType, nullable = false)()
          val cR = AttributeReference(s"${Marker}_cr", LongType, nullable = y.nullable)()
          val leftX = expandSide(left, x, bands, iL, cL)
          val rightX = expandSide(right, y, bands, iR, cR)
          // matched band is the FIRST agreeing one: for every earlier band
          // the chunks must differ — each qualifying pair then survives
          // exactly once, preserving the theta-join's multiplicity
          val firstAgree = (0 until bands - 1).map { jb =>
            Or(GreaterThanOrEqual(Literal(jb), iL),
              Not(EqualTo(chunk(x, jb, bands), chunk(y, jb, bands))))
          }
          val newCond = (Seq(EqualTo(iL, iR), EqualTo(cL, cR)) ++ conjuncts ++ firstAgree)
            .reduceLeft[Expression](And)
          Project(left.output ++ right.output,
            Join(leftX, rightX, Inner, Some(newCond), hint))
      }
  }

  /** True when l/r reference opposite join sides (either orientation). */
  private def crossSides(l: Expression, r: Expression, left: LogicalPlan,
                         right: LogicalPlan): Boolean =
    (l.references.nonEmpty && r.references.nonEmpty) &&
      ((l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet)) ||
        (l.references.subsetOf(right.outputSet) && r.references.subsetOf(left.outputSet)))

  /** Split the xor operands across the join sides (either orientation). */
  private def sidesSplit(xorE: BitwiseXor, left: LogicalPlan,
                         right: LogicalPlan): Option[(Expression, Expression)] = {
    val (a, b) = (xorE.left, xorE.right)
    if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet) &&
      a.references.nonEmpty && b.references.nonEmpty) Some((a, b))
    else if (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet) &&
      a.references.nonEmpty && b.references.nonEmpty) Some((b, a))
    else None
  }
}
