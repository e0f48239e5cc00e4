package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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

/** n-D Hilbert index (n ≥ 3) of a grid-coordinate ARRAY — the
  * Butz/Skilling transform as a codegen kernel
  * ([[HilbertIndex.axesToIndex]]). The coordinates ride ONE
  * `array<bigint>` child (built by `array(zb_c1, …, zb_cn)` in
  * [[graft.operators.LayoutOps.hilbertKey]]) so the expression stays
  * in the engine's unary codegen shape; the array is a primitive
  * long[] extraction per row, still inside whole-stage codegen — no
  * boxing, no UDF. `dims` is pinned at construction: a row whose
  * array length differs errors loudly (a silently truncated
  * coordinate list would fold distant cells together). Out-of-range
  * coordinates and null elements error loudly like the 2-D form;
  * a null array → null. SQL surface:
  * `hilbert_index_n(coords, dims[, bits])` (bits defaults to 8).
  */
case class HilbertIndexN(child: Expression, dims: Int, bits: Int)
    extends UnaryExpression {

  require(dims >= 3 && bits >= 1 && dims * bits <= 62,
    s"hilbert_index_n: $dims dims x $bits bits outside the valid " +
      "shape (n >= 3, n*bits <= 62) — use hilbert_index for 2 dims")

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType

  override def prettyName: String = "hilbert_index_n"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hilbert_index_n needs array<bigint> grid coordinates, got " +
          t.catalogString)
    }

  override def nullSafeEval(v: Any): Any =
    HilbertIndexN.fromArrayData(v.asInstanceOf[ArrayData], dims, bits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = HilbertIndexN.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.fromArrayData($c, $dims, $bits);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): HilbertIndexN = copy(child = newChild)
}

object HilbertIndexN {

  /** The one ArrayData → kernel bridge both eval paths call. */
  def fromArrayData(a: ArrayData, dims: Int, bits: Int): Long = {
    if (a.numElements() != dims)
      throw new IllegalArgumentException(
        s"hilbert_index_n: coordinate array has ${a.numElements()} " +
          s"elements, expression was built for $dims dims")
    var i = 0
    while (i < dims) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"hilbert_index_n: null coordinate at dim $i — a layout " +
            "dimension must be non-null")
      i += 1
    }
    HilbertIndex.axesToIndex(a.toLongArray(), bits)
  }
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

  /** n-D coordinates → Hilbert index, n ≥ 3 — the Butz/Skilling
    * transform (Butz 1971; Skilling, "Programming the Hilbert curve",
    * AIP Conf. Proc. 707, 2004): undo the per-level rotations into
    * Skilling's "transpose" form with pure XOR/AND bit exchanges,
    * Gray-encode across dimensions, then interleave the transposed
    * bits MSB-first (X(0) most significant within each level). The
    * SAME strict-locality property as the 2-D curve — consecutive
    * indexes are grid-adjacent, |Δ| summed over dims = 1 — pinned
    * exhaustively by spec at n = 3. n = 2 deliberately stays on
    * [[xy2d]] (Skilling's n = 2 orientation differs; two 2-D curves
    * in one engine would be a silent layout fork).
    *
    * Shared by the interpreted and generated paths — one kernel.
    */
  def axesToIndex(xs: Array[Long], bits: Int): Long = {
    val n = xs.length
    require(n >= 3,
      s"hilbert axesToIndex: $n dims — use xy2d for 2 dims (the " +
        "engine's one 2-D curve)")
    require(bits >= 1 && n * bits <= 62,
      s"hilbert axesToIndex: $n dims x $bits bits overflows a " +
        "signed 64-bit index")
    val side = 1L << bits
    var i = 0
    while (i < n) {
      if (xs(i) < 0 || xs(i) >= side)
        throw new IllegalArgumentException(
          s"hilbert axesToIndex: coordinate ${xs(i)} (dim $i) " +
            s"outside [0, $side) for bits=$bits — bucket dimensions " +
            "first (LayoutOps.hilbertKey does)")
      i += 1
    }
    val x = xs.clone()
    // inverse undo: for q = M..2, exchange/invert the low bits of
    // x(0)/x(i) under mask p — Skilling's AxestoTranspose loop
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode (sequential: each dim folds the already-updated
    // previous one)
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0L) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transpose → index: bit L of x(j) lands at position L·n + (n−1−j)
    var d = 0L
    var lev = 0
    while (lev < bits) {
      var j = 0
      while (j < n) {
        d |= ((x(j) >> lev) & 1L) << (lev * n + (n - 1 - j))
        j += 1
      }
      lev += 1
    }
    d
  }

  /** Hilbert index → n-D coordinates: the exact inverse of
    * [[axesToIndex]] (round-trip spec-pinned over the full grid at
    * n = 3). Driver-side consumer: the n-D box enumerator's
    * orthant-corner probe ([[graft.operators.LayoutOps
    * .hilbertCellsForBoxN]]).
    */
  def indexToAxes(d: Long, n: Int, bits: Int): Array[Long] = {
    require(n >= 3 && bits >= 1 && n * bits <= 62,
      s"hilbert indexToAxes: bad shape n=$n bits=$bits")
    val total = 1L << (n * bits)
    require(d >= 0 && d < total,
      s"hilbert indexToAxes: index $d outside [0, $total)")
    val x = new Array[Long](n)
    // index → transpose
    var lev = 0
    while (lev < bits) {
      var j = 0
      while (j < n) {
        x(j) |= ((d >> (lev * n + (n - 1 - j))) & 1L) << lev
        j += 1
      }
      lev += 1
    }
    // Gray decode
    var t = x(n - 1) >> 1
    var i = n - 1
    while (i > 0) { x(i) ^= x(i - 1); i -= 1 }
    x(0) ^= t
    // redo the per-level rotations (Skilling's TransposetoAxes loop)
    var q = 2L
    val cap = 2L << (bits - 1)
    while (q != cap) {
      val p = q - 1
      i = n - 1
      while (i >= 0) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val tt = (x(0) ^ x(i)) & p; x(0) ^= tt; x(i) ^= tt }
        i -= 1
      }
      q <<= 1
    }
    x
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
