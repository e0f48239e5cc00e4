package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native lookup-table sum — the asymmetric-distance scoring kernel of
  * PQ search ([[graft.operators.VectorOps.pqTopK]] / `ivfPqTopK`):
  * `lut_sum(codes, luts) = Σ_s luts[s][codes[s]]`.
  *
  * Replaces the interpreted `aggregate(zip_with(codes, lut, (c, l) ->
  * l[c]), 0d, (a, x) -> a + x)` pair in the ADC scan: higher-order
  * lambdas evaluate through CodegenFallback with per-element closure
  * dispatch and an intermediate zipped array per row — this expression
  * is a branch-free generated loop over the code bytes, the part of
  * IVF-PQ that runs once per corpus vector and therefore IS the scan
  * cost at 100 TB. Summation is left-to-right in double precision,
  * bit-identical to the fold it replaces (spec-enforced).
  *
  * Loud failure on shape violations (code set vs LUT count, code out
  * of a LUT's range, NULL elements) — same erroring-over-wrong-answers
  * stance as [[ArrayDot]]: a silently null score would rank real
  * candidates below missing ones. NULL ELEMENTS are the one deliberate
  * divergence from the fold (which propagates them to a null score):
  * codes are machine-built, so a null slot is corrupt input, and
  * erroring keeps the generated loop branch-free on the hot path.
  * A WHOLE-ARRAY null input, by contrast, follows standard null
  * semantics (nullSafeEval/nullSafeCodeGen propagate it to a null
  * score — the expression is nullable like any binary expression);
  * both producers ([[graft.operators.VectorOps.pqEncodeWith]] codes,
  * broadcast-literal LUT rows) are non-null by construction, so the
  * element-level checks are the ones guarding real corruption.
  */
case class LutSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"lut_sum needs (array<int>, array<array<double>>), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val luts = r.asInstanceOf[ArrayData]
    if (codes.numElements() != luts.numElements())
      throw new IllegalArgumentException(
        s"lut_sum: ${codes.numElements()} codes vs ${luts.numElements()} LUTs")
    val n = codes.numElements()
    var sum = 0.0
    var s = 0
    while (s < n) {
      // ArrayData.getInt on a null slot reads 0 — a silently wrong
      // lookup, not a propagated null. Refuse corrupt input loudly.
      if (codes.isNullAt(s) || luts.isNullAt(s))
        throw new IllegalArgumentException(
          s"lut_sum: NULL element at sub-space $s")
      val c = codes.getInt(s)
      val lut = luts.getArray(s)
      if (c < 0 || c >= lut.numElements())
        throw new IllegalArgumentException(
          s"lut_sum: code $c outside LUT of ${lut.numElements()} at sub-space $s")
      // same silent-zero hazard one level down: getDouble on a null LUT
      // slot reads 0.0
      if (lut.isNullAt(c))
        throw new IllegalArgumentException(
          s"lut_sum: NULL LUT entry $c at sub-space $s")
      sum += lut.getDouble(c)
      s += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, luts) => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val lut = ctx.freshName("lut")
      val sum = ctx.freshName("sum")
      s"""
         |if ($codes.numElements() != $luts.numElements()) {
         |  throw new IllegalArgumentException(
         |    "lut_sum: " + $codes.numElements() + " codes vs " + $luts.numElements() + " LUTs");
         |}
         |int $n = $codes.numElements();
         |double $sum = 0.0;
         |for (int $s = 0; $s < $n; $s++) {
         |  if ($codes.isNullAt($s) || $luts.isNullAt($s)) {
         |    throw new IllegalArgumentException(
         |      "lut_sum: NULL element at sub-space " + $s);
         |  }
         |  int $c = $codes.getInt($s);
         |  org.apache.spark.sql.catalyst.util.ArrayData $lut = $luts.getArray($s);
         |  if ($c < 0 || $c >= $lut.numElements()) {
         |    throw new IllegalArgumentException(
         |      "lut_sum: code " + $c + " outside LUT of " + $lut.numElements() + " at sub-space " + $s);
         |  }
         |  if ($lut.isNullAt($c)) {
         |    throw new IllegalArgumentException(
         |      "lut_sum: NULL LUT entry " + $c + " at sub-space " + $s);
         |  }
         |  $sum += $lut.getDouble($c);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LutSum =
    copy(left = newLeft, right = newRight)
}
