package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over two float/double array columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * evaluated by the interpreter — per-element lambda dispatch dominates in
  * similarity kernels (millions of pairs x vector dim). This native
  * `Expression` emits a tight Java loop inside whole-stage codegen instead
  * (SURVEY.md §7.4: custom Catalyst only where built-ins can't express the
  * semantics *efficiently*).
  *
  * Semantics are IDENTICAL to the HOF form on equal-length inputs (every
  * registered plan): elements cast to double (float->double is exact),
  * products summed in index order — so results are bit-equal to the DuckDB
  * oracle's ordered list_sum and to the previous implementation. Null
  * elements contribute 0; mismatched lengths use the shorter prefix (where
  * the HOF form's null padding would instead annihilate the sum).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
      if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects two array<float|double> args, got ${left.dataType} / ${right.dataType}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (b.isNullAt(i)) 0.0 else if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression, arr: String, i: String): String =
      if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.isNullAt($i) ? 0.0 : ${getter(left, a, i)};
         |  double $y = $b.isNullAt($i) ? 0.0 : ${getter(right, b, i)};
         |  ${ev.value}Acc += $x * $y;
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd count of agreeing positions between two integral-array columns
  * — the MinHash verify kernel (estimated Jaccard = agree/numPerm).
  *
  * Same motivation as [[DotProduct]]: the HOF form
  * `aggregate(zip_with(a, b, (x,y) => when(x === y, 1).otherwise(0)), ...)`
  * runs interpreted, and the verify stage executes once per LSH candidate
  * pair — the hottest loop of the near-dup family at corpus scale.
  *
  * Semantics are IDENTICAL to that HOF form: positions beyond the shorter
  * array and positions where either element is null contribute 0 (zip_with
  * pads with nulls; `null === x` is null → otherwise(0)); equal non-null
  * elements contribute 1.
  */
case class SigAgree(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private val integral: Set[DataType] = Set(IntegerType, LongType, ShortType, ByteType)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _)) if lt == rt && integral(lt) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_sig_agree expects two array<integral> args of the same element type, " +
          s"got ${left.dataType} / ${right.dataType}")
  }

  private def elemType: DataType = left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    val lt = elemType
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val eq = lt match {
          case LongType  => a.getLong(i) == b.getLong(i)
          case IntegerType => a.getInt(i) == b.getInt(i)
          case ShortType => a.getShort(i) == b.getShort(i)
          case _         => a.getByte(i) == b.getByte(i)
        }
        if (eq) c += 1
      }
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = elemType match {
      case LongType    => "getLong"
      case IntegerType => "getInt"
      case ShortType   => "getShort"
      case _           => "getByte"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int ${ev.value}Acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.$getter($i) == $b.$getter($i)) {
         |    ${ev.value}Acc++;
         |  }
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The whole MinHash signature in one pass over a document's base-hash
  * array: component i = min over the array of (a_i·x + b_i) mod p, the
  * exact affine family of [[graft.ops.Dedup.minhashPerm]] — values are
  * bit-identical to the 64-parallel-`min`-aggregates formulation (and to
  * the DuckDB twin's cross-join form), this is purely a physical change.
  *
  * Why: the aggregate form pays a 64-column min buffer per group and
  * per-row evaluation of 64 separate agg expressions — measured 13.2 s for
  * signatures alone at 50k docs, ~5× the cost of shingling+hashing. Here
  * the k·n integer ops run in ONE tight JVM loop per document (row count =
  * docs, so per-row interpreter overhead is amortized across the array;
  * `CodegenFallback` is deliberate — the loop body IS the work).
  *
  * Null elements are skipped (cannot happen in the staged pipelines);
  * an empty array yields component values p-1 (no shingle evidence —
  * matches min over the empty group never occurring in the agg form,
  * where such docs simply have no row; callers keep that contract by
  * construction since explodedShingles emits >= 1 shingle per doc).
  */
case class MinhashSignature(child: Expression, numPerm: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val P = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_minhash_sig expects array<bigint>, got $t")
  }

  @transient private lazy val as: Array[Long] =
    Array.tabulate(numPerm)(i => ((i + 1) * 2654435761L) % P)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(numPerm)(i => ((i + 1) * 40503L + 7) % P)

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val mins = Array.fill(numPerm)(P - 1)
    var j = 0
    while (j < n) {
      if (!xs.isNullAt(j)) {
        val x = xs.getLong(j)
        var i = 0
        while (i < numPerm) {
          val v = (as(i) * x + bs(i)) % P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash bit votes over a document's flat token-word array: the input
  * concatenates, per token, its `nWords` portable 32-bit md5 words
  * (entry j belongs to word j % nWords); each word's 32 bits vote ±1 and
  * the output packs each word's sign bits into one long in [0, 2^32) —
  * callers assemble the final 64/128-bit fingerprint by shifting word
  * packs together. Values are bit-identical to the 64/128-parallel
  * conditional-sum-aggregate formulation (votes are order-insensitive) —
  * a physical change only, same reasoning and measured class as
  * [[MinhashSignature]].
  */
case class SimhashPack(child: Expression, nWords: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_simhash expects array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    require(n % nWords == 0,
      s"graft_simhash: flat array length $n is not a multiple of nWords=$nWords")
    val counts = new Array[Int](nWords * 32)
    var j = 0
    while (j < n) {
      val x = xs.getLong(j)
      val base = (j % nWords) * 32
      var b = 0
      while (b < 32) {
        if (((x >> b) & 1L) == 1L) counts(base + b) += 1 else counts(base + b) -= 1
        b += 1
      }
      j += 1
    }
    val out = new Array[Long](nWords)
    var w = 0
    while (w < nWords) {
      var acc = 0L
      var b = 0
      while (b < 32) {
        if (counts(w * 32 + b) >= 0) acc |= (1L << b)
        b += 1
      }
      out(w) = acc
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Session registration for graft's native expressions (usable from SQL as
  * `graft_dot(a, b)` / `graft_sig_agree(a, b)` and from the DataFrame API
  * via `call_function`).
  */
object GraftFunctions {
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (children => DotProduct(children.head, children(1))),
    "graft_sig_agree" -> (children => SigAgree(children.head, children(1))),
    "graft_minhash_sig" -> (children => MinhashSignature(children.head,
      children(1).eval().asInstanceOf[Int])),
    "graft_simhash" -> (children => SimhashPack(children.head,
      children(1).eval().asInstanceOf[Int])))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = functions.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[DotProduct].getName, name),
      builder)
  }
}

/** `spark.sql.extensions`-style injection for clusters configured with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`: the
  * native expressions plus the banded-Hamming join rewrite
  * ([[graft.plans.HammingJoinRewrite]] — naive `bit_count(a^b) <= k`
  * theta-joins become pigeonhole equi-joins instead of cartesians).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[DotProduct].getName, name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.HammingJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.FuzzyJoinRewrite)
  }
}
