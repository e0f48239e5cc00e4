package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom MEMBERSHIP probe against a driver-held serialized filter —
  * the set-membership member of the sketch family, and the probe side
  * of [[graft.operators.MembershipStore]].
  *
  * Why this exists next to [[Bloom]] (the `BloomFilterAggregate`
  * wrappers): the aggregate-expression pair is clamped by Spark's
  * runtime-filter confs (~4M items / 64Mbit) — right for a BOUNDED
  * benchmark prefilter, wrong for a corpus-scale seen-set. This probe
  * pairs with `org.apache.spark.util.sketch.BloomFilter` (the public
  * sketch library, `DataFrame.stat.bloomFilter` on the build side),
  * which sizes to the declared `expectedItems` with no conf clamp.
  *
  * Add/probe hash agreement: the build side
  * (`DataFrameStatFunctions.bloomFilter` over a string column) puts
  * the column's UTF-8 BYTES; this probe calls
  * `mightContainBinary(UTF8String.getBytes)` — same bytes, same
  * hashes (spec-pinned: zero false negatives on the built set).
  * Probing is a pure projection — the filter rides the plan as a
  * reference object ([[CmsEstimate]]'s posture); no join, no shuffle.
  */
object BloomProbe {

  /** Deserialize once driver-side; the expression carries the live
    * filter into codegen.
    */
  def contains(sketchBytes: Array[Byte], c: Column): Column =
    column(BloomMightContainBytes(expression(c),
      BloomFilter.readFrom(new ByteArrayInputStream(sketchBytes))))
}

/** `bloom_contains(token)`: whether the filter has (possibly) seen the
  * token — false is DEFINITE (no false negatives), true has the
  * filter's false-positive probability. Null token → null.
  */
case class BloomMightContainBytes(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains needs a string column, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainBytes =
    copy(child = newChild)
}
