package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graftshim.ColumnBridge._
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Spark's internal Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind runtime bloom-filter join pruning, not exposed in the public
  * function registry). graft uses them for the broadcast-sketch
  * prefilter pattern ([[graft.operators.TextOps.decontaminate]]):
  * aggregate a BOUNDED key set into one binary sketch, ship it as an
  * expression literal, and prefilter a corpus-scale side with a pure
  * projection — no shuffle, no join — before an exact confirmation
  * join over the few candidates.
  *
  * Both sides hash through `xxhash64` (the expressions operate on
  * 64-bit hashes, exactly as Spark's runtime-filter rewrite wires
  * them). Bloom filters have NO false negatives, so a prefilter +
  * exact-confirm composition is semantically invisible — only the
  * false-positive rate (a cost knob, `bitsPerItem`) varies.
  */
object Bloom {

  /** Aggregate `c`'s values into a serialized Bloom filter sketch
    * (binary). `items` sizes the expected distinct count; `numBits`
    * the filter width (optimal hash count is derived by Spark's
    * sketch library).
    *
    * CLAMP: Spark caps both arguments at the runtime-filter confs
    * (`spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
    * `.maxNumBits`, defaults 4M items / 64Mbit = 8 MB) — a key set
    * beyond ~4M entries silently gets a saturating filter and a far
    * higher false-positive rate than `numBits / items` implies.
    * Correctness is unaffected (false positives only; the
    * [[graft.operators.TextOps.decontaminate]] pattern re-confirms
    * exactly), but a deployment sketching a benchmark that large
    * should raise those confs alongside this call.
    */
  def bloomAgg(c: Column, items: Long, numBits: Long): Column =
    column(new BloomFilterAggregate(
      expression(xxhash64(c)),
      Literal(items), Literal(numBits)).toAggregateExpression())

  /** Build and collect the sketch of `grams(column)` driver-side —
    * the one-binary-value artifact the prefilter pattern ships as a
    * literal. One count job + one aggregate job; callers holding a
    * multi-use `grams` should `localCheckpoint()` it first.
    */
  def sketchOf(grams: org.apache.spark.sql.DataFrame, column: String,
               bitsPerItem: Int): Array[Byte] = {
    val n = math.max(1L, grams.count())
    grams.agg(bloomAgg(org.apache.spark.sql.functions.col(column),
      n, n * bitsPerItem)).head.getAs[Array[Byte]](0)
  }

  /** Membership probe of `c` against a driver-held serialized sketch,
    * shipped as a foldable binary literal (broadcast-literal
    * semantics — the sketch rides the plan, nothing is joined).
    */
  def mightContain(sketch: Array[Byte], c: Column): Column =
    column(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      expression(xxhash64(c))))
}
