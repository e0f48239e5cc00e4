package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product of a full-precision query against an int8 code
  * vector stored as BINARY — the scan kernel of the persisted SQ8
  * index ([[graft.operators.VectorIndex.searchSq8]]): one signed byte
  * per element read straight off the parquet binary, widened to
  * double at multiply time. This is what makes the SQ8 bandwidth
  * claim REAL in storage: the codes never materialise as an
  * array<double> (8× wider) on disk or in the scan — the inline
  * [[graft.operators.VectorOps.sq8TopK]] form does exactly that and
  * is the semantics model this kernel must match bit-for-bit
  * (spec-pinned): same left-to-right double fold, same products,
  * because `(double) (byte) c == (double) c` for every code in
  * [-127, 127].
  *
  * Length mismatch errors loudly (the [[ArrayDot]] stance — silently
  * truncating would hide mixed-dimension corpora behind plausible
  * partial sums); null inputs yield null via the standard
  * null-intolerant contract.
  */
case class ByteDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), BinaryType)
      if lt == FloatType || lt == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"byte_dot needs (array<float|double>, binary) arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[Array[Byte]]
    if (a.numElements() != b.length)
      throw new IllegalArgumentException(
        s"byte_dot: length mismatch (${a.numElements()} vs ${b.length})")
    val n = b.length
    val ft = elemType == FloatType
    var sum = 0.0
    var i = 0
    while (i < n) {
      val x = if (ft) a.getFloat(i).toDouble else a.getDouble(i)
      sum += x * b(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val get =
        if (elemType == FloatType) s"(double) $a.getFloat"
        else s"$a.getDouble"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |if ($a.numElements() != $b.length) {
         |  throw new IllegalArgumentException(
         |    "byte_dot: length mismatch (" + $a.numElements() + " vs " + $b.length + ")");
         |}
         |int $n = $b.length;
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $get($i) * (double) $b[$i];
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteDot =
    copy(left = newLeft, right = newRight)
}
