package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert-curve index of a 2-D grid coordinate — the space-filling
  * curve with STRICT locality: consecutive indexes are always
  * grid-adjacent (|Δx| + |Δy| = 1, spec-pinned exhaustively), where
  * Morton/Z-order jumps across the grid at every power-of-two
  * boundary. For a layout that serves range-box reads, that means a
  * query box decomposes into fewer, longer runs of the key — fewer
  * file seeks at equal grid resolution.
  *
  * The transform is the classic per-level rotate-and-accumulate
  * (Hilbert 1891; the bit-twiddling form is the public-domain xy2d
  * loop): `bits` iterations of constant work, no allocation — a
  * whole-stage-codegen loop exactly like [[ByteDot]]'s, not a
  * composed-`Column` tree (folding the per-level CASE expressions
  * through Catalyst duplicates the carried x/y subtrees per level —
  * exponential expression growth — and a UDF would drop codegen).
  *
  * Inputs are grid coordinates in `[0, 2^bits)` (LayoutOps' bucketing
  * emits them); out-of-range coordinates error LOUDLY — a silently
  * masked high bit would fold distant cells onto each other and
  * corrupt the layout. `bits` ≤ 31 keeps the index under 2⁶². Null in
  * → null out (the standard null-intolerant contract). SQL surface:
  * `hilbert_index(x, y, bits)`.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31,
    s"hilbert_index: bits=$bits outside [1, 31] — 2·bits must fit a " +
      "signed 64-bit index")

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType

  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"hilbert_index needs (bigint, bigint) grid coordinates, got " +
          s"${left.dataType.catalogString} and " +
          s"${right.dataType.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    HilbertIndex.xy2d(l.asInstanceOf[Long], r.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val cls = HilbertIndex.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.xy2d($xv, $yv, $bits);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  /** (x, y) → Hilbert index: per-level quadrant accumulate + rotate.
    * Shared by the interpreted and the generated paths (ONE kernel —
    * a codegen/eval divergence would be a silent layout split).
    */
  def xy2d(x: Long, y: Long, bits: Int): Long = {
    require(bits >= 1 && bits <= 31,
      s"hilbert xy2d: bits=$bits outside [1, 31] — 2·bits must fit " +
        "a signed 64-bit index")
    val side = 1L << bits
    if (x < 0 || x >= side || y < 0 || y >= side)
      throw new IllegalArgumentException(
        s"hilbert_index: coordinate ($x, $y) outside the " +
          s"[0, $side) x [0, $side) grid for bits=$bits — bucket " +
          "dimensions first (LayoutOps.hilbertKey does)")
    var xx = x
    var yy = y
    var d = 0L
    var s = side >> 1
    while (s > 0) {
      val rx = if ((xx & s) > 0) 1L else 0L
      val ry = if ((yy & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          xx = s - 1 - xx
          yy = s - 1 - yy
        }
        val t = xx; xx = yy; yy = t
      }
      s >>= 1
    }
    d
  }

  /** Hilbert index → (x, y): the exact inverse (spec-pinned as a
    * round-trip over the full grid). Driver-side consumer: turning a
    * key-range back into the grid walk it covers.
    */
  def d2xy(d: Long, bits: Int): (Long, Long) = {
    val side = 1L << bits
    require(d >= 0 && d < side * side,
      s"hilbert d2xy: index $d outside [0, ${side * side}) for bits=$bits")
    var x = 0L
    var y = 0L
    var t = d
    var s = 1L
    while (s < side) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}
