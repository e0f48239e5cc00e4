package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min point-frequency probe against a driver-held serialized
  * sketch — the frequency-estimation member of the sketch family
  * (HLL = distincts, GK = quantiles, approx_top_k = heavy hitters,
  * Bloom = membership, CMS = per-item counts under fixed memory).
  *
  * The sketch is built by Spark's own `count_min_sketch` aggregate
  * (merge-combinable counter matrix: map-side partials, one small
  * binary result) and shipped to the probe as a PLAN-RIDING OBJECT
  * (`addReferenceObj`), the same broadcast-literal posture as the PQ
  * codebooks and the Bloom prefilter sketch: probing is a pure
  * projection — no join, no shuffle, each row one O(depth) lookup.
  *
  * The probe hashes the token's UTF-8 BYTES (`UTF8String.getBytes` →
  * `estimateCount(byte[])`), exactly the bytes `CountMinSketchAgg`
  * feeds `addBinary` on the build side — add/probe hash agreement is
  * what the ≥-exact gate invariant verifies end-to-end (a mismatched
  * probe path reads other rows' counters and lands BELOW the exact
  * count almost surely; CMS can only over-count when add and probe
  * hash identically).
  */
object Cms {

  /** Deserialize once driver-side; the expression carries the live
    * sketch object into codegen.
    */
  def estimate(sketchBytes: Array[Byte], c: Column): Column =
    column(CmsEstimate(expression(c),
      CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes))))
}

/** `cms_estimate(token)`: estimated occurrence count of the token in
  * the corpus the sketch aggregated. Null token → null estimate
  * (standard unary null semantics); the sketch reference is immutable
  * and thread-safe for reads.
  */
case class CmsEstimate(child: Expression, sketch: CountMinSketch)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate needs a string column, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    sketch.estimateCount(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsSketch", sketch,
      classOf[CountMinSketch].getName)
    defineCodeGen(ctx, ev, c => s"$ref.estimateCount($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}
