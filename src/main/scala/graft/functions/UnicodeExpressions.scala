package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the first
  * pass of any web-scale text-cleaning pipeline: crawled text mixes
  * precomposed and decomposed encodings of the SAME grapheme (é as U+00E9
  * vs e+U+0301), so exact dedup, shingling, and fingerprinting all see
  * spurious differences until the corpus is canonicalized. Spark ships no
  * normalization function; this wraps the JDK's ICU-derived
  * `java.text.Normalizer` (canonical composition, NFC) behind the PqAdc
  * reference-object codegen pattern so the hot cleaning path stays inside
  * whole-stage pipelines.
  *
  * NFC (not NFKC) deliberately: canonical equivalence is lossless — the
  * normalized string renders identically everywhere — while compatibility
  * folding (ﬁ→fi, ㎡→m2) destroys distinctions a corpus may care about;
  * it also makes the operator engine-portable bit-for-bit (DuckDB's
  * `nfc_normalize` implements the same UAX #15 form, which is what the
  * oracle gate leans on). ASCII fast path: a string with no code unit >=
  * 0x80 is returned UNCHANGED without the Normalizer walk (NFC is the
  * identity on ASCII), which is most of a web corpus.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects a string arg, got $t")
  }

  def normalize(s: UTF8String): UTF8String = {
    // UTF-8 bytes >= 0x80 mark exactly the non-ASCII code points
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }

  override def nullSafeEval(v: Any): Any = normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfc", this, classOf[NfcNormalize].getName)
    defineCodeGen(ctx, ev, c => s"$ref.normalize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
