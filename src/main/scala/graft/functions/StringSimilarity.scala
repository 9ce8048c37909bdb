package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Jaro–Winkler similarity over two string columns — the
  * entity-resolution scorer Spark's function library lacks (it ships
  * levenshtein only). Rank-sensitive name matching wants JW's
  * prefix-weighted score, not an edit count: "Customer#000001" vs
  * "Customer#000002" is distance 1 AND prefix-similar 0.973, while
  * "dixon" vs "dicksonx" is distance 4 but still 0.813 — the measure the
  * record-linkage literature standardized on (Winkler '90, the Census
  * string comparator).
  *
  * Semantics are pinned to the DuckDB reference implementation so the
  * score is hash-gateable (verified value-for-value against
  * `jaro_winkler_similarity` over textbook and adversarial cases,
  * StringSimilaritySpec):
  *  - Jaro: match window ⌊max(|a|,|b|)/2⌋ − 1, transpositions counted
  *    over matched sequences, (m/|a| + m/|b| + (m−t)/m) / 3;
  *  - either side empty → 0.0 (the DuckDB convention — NOT the
  *    textbook's 1.0 for both-empty);
  *  - Winkler boost ONLY when jaro > 0.7: + l·0.1·(1 − jaro) with l =
  *    common prefix capped at 4 (the thresholded variant — measured:
  *    DuckDB does not boost below 0.7).
  * Unicode note: computed over UTF-16 code units (Spark `levenshtein`
  * does the same); identical to code-point semantics on BMP text, which
  * is all the registered corpora contain.
  *
  * A scalar per-pair kernel belongs in whole-stage codegen: the generated
  * code calls one static JIT-able method (the [[PqAdc]] discipline — no
  * per-row lambda dispatch, no interpreted fallback).
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects two string args, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mm = m.toDouble
    val jaro = (mm / la + mm / lb + (mm - t / 2) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val cap = math.min(4, math.min(la, lb))
    while (l < cap && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
