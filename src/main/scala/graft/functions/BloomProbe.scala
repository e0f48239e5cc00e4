package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

  /** Sharded probe ([[graft.operators.ShardedMembershipStore]]): the
    * blob ARRAY rides the plan once (nulls = never-extended shards,
    * definite false); the shard id arrives as a CHILD computed by
    * the same plan-side `pmod(hash(key), shards)` the extend path
    * routes with, so probe and extend routing cannot drift.
    */
  def containsSharded(filters: Array[BloomFilter], key: Column,
      shard: Column): Column =
    column(BloomShardMightContain(expression(key), expression(shard),
      filters))
}

/** `bloom_shard_contains(key, shard)`: membership probe routed into
  * one of N shard filters. False is DEFINITE (including the
  * absent-shard null slot); true carries the shard's fpp.
  */
case class BloomShardMightContain(left: Expression, right: Expression,
    filters: Array[BloomFilter]) extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "bloom_shard_contains needs (string key, int shard), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(k: Any, s: Any): Any = {
    val f = filters(s.asInstanceOf[Int])
    f != null && f.mightContainBinary(
      k.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shardFilters", filters,
      s"${classOf[BloomFilter].getName}[]")
    defineCodeGen(ctx, ev, (k, s) =>
      s"($ref[$s] != null && $ref[$s].mightContainBinary($k.getBytes()))")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BloomShardMightContain =
    copy(left = newLeft, right = newRight)
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
