package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Bounded k-minimum-values buffer: `rows` is ascending, DISTINCT and
  * never longer than k. A case class so the public `Encoders.product`
  * derivation applies (struct of one array of strings — a compact
  * shuffled partial of at most k hash strings).
  */
final case class KMinBuf(rows: List[String])

/** K-minimum-values (KMV / bottom-k theta) sketch as a typed
  * [[Aggregator]] — the distinct-counting companion to
  * [[TopKAgg]]'s ranking buffer. The sketch of a column is the k
  * lexicographically-smallest DISTINCT hash strings of its values;
  * because the buffer dedups on insert, the aggregation needs no
  * upstream `DISTINCT` shuffle: each task partial-aggregates map-side
  * into a ≤ k-element buffer and the exchange carries at most
  * k·partitions strings per group, never a row per input value. That
  * is the whole 100 TB story — per-source vocabulary sketches over a
  * corpus cost one scan and kilobytes of state, and every set
  * operation after it (distinct estimate, union, intersection,
  * Jaccard) is arithmetic over two k-lists (Beyer et al.,
  * "On Synopses for Distinct-Value Estimation Under Multiset
  * Operations", SIGMOD'07).
  *
  * Unlike HLL, every derived statistic is a DETERMINISTIC function of
  * the input set given the hash: md5 hex strings order identically in
  * Spark and DuckDB (both binary-collate ASCII), so the gates built on
  * this sketch hash-check end-to-end — no error-bound-invariant oracle
  * needed.
  *
  * Merge is associative and commutative (fold of dedup-inserts into an
  * ordered bounded buffer), so the result is independent of row order,
  * partitioning and merge tree (spec-pinned against a 1-partition
  * replay). Null hashes are skipped, matching SQL aggregate semantics.
  */
final class KMinAgg(k: Int)
    extends Aggregator[String, KMinBuf, KMinBuf] {

  require(k > 0, s"k-min sketch needs k > 0, got $k")

  override def zero: KMinBuf = KMinBuf(Nil)

  override def reduce(buf: KMinBuf, h: String): KMinBuf =
    if (h == null) buf else insert(buf, h)

  override def merge(a: KMinBuf, b: KMinBuf): KMinBuf =
    b.rows.foldLeft(a)(insert)

  /** Insert into the sorted-ascending bounded buffer, skipping values
    * already present (a duplicate must not occupy a second slot — the
    * sketch is a set synopsis) and values ranked below k smaller ones.
    */
  private def insert(buf: KMinBuf, h: String): KMinBuf = {
    val (ahead, behind) = buf.rows.span(_ < h)
    if (behind.headOption.contains(h)) buf
    else if (ahead.lengthCompare(k) >= 0) buf
    else KMinBuf((ahead ::: h :: behind).take(k))
  }

  // output stays the buffer struct (`sk.rows` unwraps the array in
  // SQL): both encoders ride the public Encoders.product derivation
  override def finish(buf: KMinBuf): KMinBuf = buf

  override def bufferEncoder: Encoder[KMinBuf] = Encoders.product[KMinBuf]

  override def outputEncoder: Encoder[KMinBuf] = Encoders.product[KMinBuf]
}
