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
  * (or, for 128-bit fingerprints split across two longs,
  * `bit_count(hiA ^ hiB) + bit_count(loA ^ loB) <= lit(7)`), which Spark
  * can only plan as BroadcastNestedLoopJoin / CartesianProduct —
  * O(|a|·|b|) comparisons, the exact plan that dies at corpus scale and
  * that every fingerprint operator here avoids by hand via
  * [[graft.ops.Dedup.hamming64NearDupPairs]]. This rule teaches the
  * OPTIMIZER the same trick, so the naive form gets the scale-safe plan
  * transparently:
  *
  *  - split the fingerprint's bit space into k+1 contiguous chunks (floor
  *    boundaries; chunks may straddle word boundaries in the multi-word
  *    form). By pigeonhole, two keys within Hamming distance k agree on
  *    at least one whole chunk — recall is exactly 1;
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
  * bits and the candidate volume approaches all-pairs anyway) and large
  * enough that a chunk fits one long (k+1 ≥ word count); all xor operands
  * must be LongType and split cleanly across the two sides. Any other
  * conjuncts in the join condition ride along unchanged. The rule skips
  * joins that already carry cross-side equi keys (hand-banded plans) and
  * plans it already rewrote (marker attribute prefix), so it is
  * fixpoint-safe.
  */
object HammingJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val Marker = "__graft_hband"
  private val MaxBound = 15

  /** Bound extraction from `Σ bit_count(xor) <= k`-shaped conjuncts;
    * handles both orientations, strict forms, integral casts, and a sum
    * of per-word bit_counts for fingerprints wider than one long.
    */
  private object HammingBound {
    private def bc(e: Expression): Option[BitwiseXor] = e match {
      case BitwiseCount(x @ BitwiseXor(_, _)) => Some(x)
      case Cast(inner, t, _, _) if t == IntegerType || t == LongType => bc(inner)
      case _ => None
    }
    /** Word list, first operand = bits [0, 64), next = [64, 128), ... */
    private def bcSum(e: Expression): Option[Seq[BitwiseXor]] = e match {
      case Add(l, r, _) => for (a <- bcSum(l); b <- bcSum(r)) yield a ++ b
      case Cast(inner, t, _, _) if t == IntegerType || t == LongType => bcSum(inner)
      case other => bc(other).map(Seq(_))
    }
    private def lit(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case Literal(v: Long, LongType) if v.isValidInt => Some(v.toInt)
      case Cast(inner, _, _, _) => lit(inner)
      case _ => None
    }
    /** Returns (per-word xors low→high, inclusiveBound). */
    def unapply(e: Expression): Option[(Seq[BitwiseXor], Int)] = e match {
      case LessThanOrEqual(l, r) => for (x <- bcSum(l); k <- lit(r)) yield (x, k)
      case GreaterThanOrEqual(l, r) => for (k <- lit(l); x <- bcSum(r)) yield (x, k)
      case LessThan(l, r) => for (x <- bcSum(l); k <- lit(r)) yield (x, k - 1)
      case GreaterThan(l, r) => for (k <- lit(l); x <- bcSum(r)) yield (x, k - 1)
      case _ => None
    }
  }

  /** Chunk j of [0, bands) over a multi-word key (word w = bits
    * [w·64, (w+1)·64)): bits [j·B/bands, (j+1)·B/bands) where B = 64·words,
    * assembled from the overlapping word slices. Chunk width ≤ 64 is
    * guaranteed by the bands ≥ words guard.
    */
  private def chunk(words: Seq[Expression], j: Int, bands: Int): Expression = {
    val totalBits = 64 * words.length
    val lo = j * totalBits / bands
    val hi = (j + 1) * totalBits / bands
    val pieces = words.indices.flatMap { w =>
      val s = math.max(lo, w * 64)
      val e = math.min(hi, (w + 1) * 64)
      if (s >= e) None
      else {
        val width = e - s
        val mask = if (width == 64) -1L else (1L << width) - 1L
        val bits = BitwiseAnd(ShiftRightUnsigned(words(w), Literal(s - w * 64)), Literal(mask))
        Some(if (s == lo) bits else ShiftLeft(bits, Literal(s - lo)))
      }
    }
    pieces.reduceLeft[Expression](BitwiseOr)
  }

  private def expandSide(plan: LogicalPlan, words: Seq[Expression], bands: Int,
                         iAttr: AttributeReference, cAttr: AttributeReference): Expand = {
    val projections = (0 until bands).map { j =>
      plan.output :+ Literal(j) :+ chunk(words, j, bands)
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
        case HammingBound(xors, k)
            if k >= 0 && k <= MaxBound && k + 1 >= xors.length &&
              xors.forall(_.left.dataType == LongType) &&
              splitAll(xors, left, right).isDefined =>
          (xors, k)
      }
      candidate match {
        case None => j
        case Some((xors, k)) =>
          val Some((xWords, yWords)) = splitAll(xors, left, right)
          val bands = k + 1
          val iL = AttributeReference(s"${Marker}_il", IntegerType, nullable = false)()
          val cL = AttributeReference(s"${Marker}_cl", LongType,
            nullable = xWords.exists(_.nullable))()
          val iR = AttributeReference(s"${Marker}_ir", IntegerType, nullable = false)()
          val cR = AttributeReference(s"${Marker}_cr", LongType,
            nullable = yWords.exists(_.nullable))()
          val leftX = expandSide(left, xWords, bands, iL, cL)
          val rightX = expandSide(right, yWords, bands, iR, cR)
          // matched band is the FIRST agreeing one: for every earlier band
          // the chunks must differ — each qualifying pair then survives
          // exactly once, preserving the theta-join's multiplicity
          val firstAgree = (0 until bands - 1).map { jb =>
            Or(GreaterThanOrEqual(Literal(jb), iL),
              Not(EqualTo(chunk(xWords, jb, bands), chunk(yWords, jb, bands))))
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

  /** Split one xor's operands across the join sides (either orientation),
    * normalized to (leftSideExpr, rightSideExpr).
    */
  private def sidesSplit(xorE: BitwiseXor, left: LogicalPlan,
                         right: LogicalPlan): Option[(Expression, Expression)] = {
    val (a, b) = (xorE.left, xorE.right)
    if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet) &&
      a.references.nonEmpty && b.references.nonEmpty) Some((a, b))
    else if (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet) &&
      a.references.nonEmpty && b.references.nonEmpty) Some((b, a))
    else None
  }

  /** Split EVERY word pair across the sides; normalization per word keeps
    * the word order consistent on both sides.
    */
  private def splitAll(xors: Seq[BitwiseXor], left: LogicalPlan,
                       right: LogicalPlan): Option[(Seq[Expression], Seq[Expression])] = {
    val splits = xors.map(sidesSplit(_, left, right))
    if (splits.forall(_.isDefined)) Some((splits.map(_.get._1), splits.map(_.get._2)))
    else None
  }
}
