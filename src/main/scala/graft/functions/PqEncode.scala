package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native PQ encoder: for each of the `m` sub-spaces, the argmin over
  * the sub-codebook's squared distances, plus the total min-distance
  * reconstruction error — `struct(codes: array<int>, err2: double)`
  * where `err2 = Σ_s min_c |sub_s − c|²` (callers divide by dim and
  * sqrt/round for the reported RMSE).
  *
  * Replaces the per-sub-space `transform(cents, c -> aggregate(
  * zip_with(c, sub, (a,b) -> (a-b)²), 0d, acc+x))` + `array_position(
  * array_min)` HOF trees (retained as
  * `VectorOps.pqEncodeWithComposed`, the equivalence oracle —
  * `pqEncodeWith` itself now calls this kernel): those evaluate through CodegenFallback with a lambda dispatch and an
  * intermediate array per (row, sub-space, centroid); this is one
  * generated call per row. Math is fold-order identical (distances
  * accumulate left-to-right over the sub-vector; ties pick the FIRST
  * minimal centroid, as `array_position(d, array_min(d))` does) —
  * spec-enforced equivalent in `VectorOpsSpec`.
  *
  * Codebooks ride the expression node and reach generated code via
  * `addReferenceObj` — broadcast-literal semantics, nothing shuffled.
  * Input must be `array<double>` of exactly `m × dsub` NON-NULL
  * elements; a ragged row or a null element errors loudly
  * ([[ArrayDot]]'s / [[LutSum]]'s stance — ArrayData reads a null slot
  * as 0.0, a silently wrong encode, so corrupt input must throw).
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode needs at least one centroid per sub-space")
  private val m = codebooks.length
  private val dsub = codebooks(0)(0).length
  require(codebooks.forall(_.forall(_.length == dsub)),
    s"pq_encode codebooks must be rectangular (dsub = $dsub)")

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("err2", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<double>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    PqEncode.encode(input.asInstanceOf[ArrayData], codebooks, m, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks,
      "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqEncode.encode($c, $cb, $m, $dsub);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {

  /** Shared by interpreted eval and generated code. */
  def encode(v: ArrayData, codebooks: Array[Array[Array[Double]]],
             m: Int, dsub: Int): InternalRow = {
    if (v.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: vector of ${v.numElements()} dims cannot split into " +
          s"$m sub-spaces of $dsub")
    // one guarded copy per row: catches null slots loudly (ArrayData
    // reads them as 0.0 — a silently wrong encode) and turns the
    // m×k×dsub inner-loop reads into local array accesses instead of
    // per-element accessor calls with an index multiply
    val vv = new Array[Double](m * dsub)
    var p = 0
    while (p < vv.length) {
      if (v.isNullAt(p))
        throw new IllegalArgumentException(
          s"pq_encode: NULL element at dimension $p")
      vv(p) = v.getDouble(p)
      p += 1
    }
    val codes = new Array[Int](m)
    var err2 = 0.0
    var s = 0
    while (s < m) {
      val cents = codebooks(s)
      val base = s * dsub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val t = cent(i) - vv(base + i)
          d += t * t
          i += 1
        }
        // strict <: ties keep the FIRST minimal centroid, matching
        // array_position(d, array_min(d))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      err2 += bestD
      s += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(codes), err2))
  }
}
