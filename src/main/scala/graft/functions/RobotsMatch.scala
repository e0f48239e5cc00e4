package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt path-pattern matching (RFC 9309 §2.2.2/§2.2.3): `*`
  * matches any run of characters, a TRAILING `$` anchors the match at
  * the path's end, and an unanchored pattern matches any PREFIX of
  * the path (the grammar's implicit trailing wildcard). A `$`
  * anywhere but last is a literal character.
  *
  * A direct two-pointer glob scan, not `LIKE`/regex: the decision
  * runs once per (URL, candidate-rule) pair across the whole corpus,
  * and a non-foldable LIKE pattern falls out of codegen and
  * recompiles its matcher per row — this kernel is a generated
  * static call with zero allocation. The `robots_filter` oracle
  * replays the SAME semantics as a DuckDB `LIKE ... ESCAPE`
  * translation (escape `%`/`_`/`!`, then `*`→`%`, `$`-anchor → no
  * trailing `%`), and `RobotsOpsSpec` property-pins kernel ≡
  * translation so the two can never drift.
  */
object RobotsMatchKernel {

  private final val Star = '*'.toByte
  private final val Dollar = '$'.toByte

  /** Does robots pattern `pat` match `path`? (See object doc.)
    *
    * Byte-level two-pointer glob straight over the UTF8String
    * buffers — zero allocation per evaluation. Byte-wise matching is
    * exact for valid UTF-8: the wildcards are ASCII (never
    * continuation bytes), and a `*` that tried to swallow a PARTIAL
    * multi-byte character would leave the next pattern byte — a
    * lead byte, since patterns are valid UTF-8 — facing a
    * continuation byte, which fails equality and forces
    * re-alignment at a character boundary.
    */
  def matches(path: UTF8String, pat: UTF8String): Boolean = {
    val n = path.numBytes
    var m = pat.numBytes
    // a TRAILING '$' anchors at the path's end; without it the
    // pattern matches any PREFIX ('$' is ASCII, so the last byte IS
    // the last character iff it is '$')
    val anchored = m > 0 && pat.getByte(m - 1) == Dollar
    if (anchored) m -= 1
    var i = 0
    var j = 0
    var star = -1
    var mark = 0
    while (i < n) {
      // unanchored + pattern exhausted = a prefix matched; the rest
      // of the path is free (the grammar's implicit trailing '*')
      if (!anchored && j == m) return true
      // wildcard branch FIRST: a literal '*' in the PATH must still
      // be swallowable by a pattern '*' (byte-equality would consume
      // it literally and then dead-end)
      if (j < m && pat.getByte(j) == Star) {
        star = j; mark = i; j += 1
      } else if (j < m && pat.getByte(j) == path.getByte(i)) {
        i += 1; j += 1
      } else if (star != -1) {
        j = star + 1; mark += 1; i = mark
      } else return false
    }
    while (j < m && pat.getByte(j) == Star) j += 1
    j == m
  }
}

/** `robots_match(path, pattern)` — see [[RobotsMatchKernel]]. */
case class RobotsMatch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"robots_match needs (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(path: Any, pat: Any): Any =
    RobotsMatchKernel.matches(path.asInstanceOf[UTF8String],
      pat.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, q) => s"""
      ${ev.value} = graft.functions.RobotsMatchKernel.matches($p, $q);
    """)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): RobotsMatch =
    copy(left = newLeft, right = newRight)
}
