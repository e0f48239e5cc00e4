package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object NormalizeText {
  /** Unicode NFC via the JDK normalizer, with a fast path for text
    * that is already composed (the overwhelmingly common case — the
    * `isNormalized` check is a single scan with no allocation, while
    * `normalize` always re-builds the string). UTF8String round-trip
    * only on the slow path.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(text)`: Unicode canonical composition (NFC) — the
  * encoding-variant killer at the head of every text-ingest pipeline
  * (a decomposed `e` + U+0301 and a precomposed `é` are different
  * bytes, different shingles, different dedup fingerprints — and the
  * SAME text). Spark has no built-in; a Scala UDF would break
  * whole-stage codegen on the hottest column in the pipeline, so this
  * is a native `Expression` (the [[CharNgrams]] slot). Named after
  * DuckDB's built-in of the same signature, which the oracle replays
  * directly — both sides implement Unicode canonical composition, a
  * stability-guaranteed mapping for all assigned code points.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string argument, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    NormalizeText.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
