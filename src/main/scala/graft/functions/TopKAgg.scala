package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Bounded top-k buffer: `rows` is sorted by the aggregator's total
  * order and never longer than k. A case class so the PUBLIC
  * `Encoders.product` derivation applies (struct of one array of
  * structs — a compact shuffled partial).
  */
final case class TopKBuf(rows: List[(Double, Long)])

/** Per-group top-k as a typed [[Aggregator]] (the Spark UDAF surface,
  * SURVEY §2.9): a bounded buffer of the k best (score, id) pairs,
  * merged associatively. The scale story is the physical plan, not the
  * arithmetic — the window-function formulation (`row_number() OVER
  * (PARTITION BY g ORDER BY score)` then `rn <= k`) shuffles and sorts
  * EVERY row of every group; this aggregator partial-aggregates
  * map-side, so each task ships at most k rows per group into the
  * exchange and the final merge touches k·partitions rows per group.
  * At 100 TB that is the difference between a corpus-wide sort shuffle
  * and a fixed-size-sketch shuffle — the same partial-first shape as
  * the HLL/GK sketch rollups, expressed through the typed UDAF API.
  *
  * Ordering is TOTAL — score descending, id ascending on ties — so the
  * top-k SET is unique and the result is independent of row order,
  * partitioning and merge tree (spec-pinned; the gate oracle replays
  * the window form in SQL and must agree row-for-row).
  *
  * The buffer is a plain sorted list (never longer than k): for the
  * small k this operator targets, insertion into a k-list beats heap
  * bookkeeping. Registered for DataFrames via
  * `functions.udaf(new TopKAgg(k))`.
  */
final class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), TopKBuf, TopKBuf] {

  require(k > 0, s"top-k needs k > 0, got $k")

  // score desc, id asc — the total order shared with the SQL oracle.
  // Double.compare (not >/==) keeps the order TOTAL for NaN scores
  // (NaN ranks greatest, as SQL DESC ordering does in both Spark and
  // DuckDB — with IEEE comparisons a NaN row would freeze at the
  // buffer head and break the sorted invariant); -0.0 is normalised
  // to 0.0 first because Double.compare splits them but SQL does not.
  private def norm0(x: Double): Double = if (x == 0d) 0d else x
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(norm0(a._1), norm0(b._1))
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: TopKBuf = TopKBuf(Nil)

  override def reduce(buf: TopKBuf, row: (Double, Long)): TopKBuf =
    insert(buf, row)

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    b.rows.foldLeft(a)(insert)

  /** Insert into the sorted-descending bounded buffer. */
  private def insert(buf: TopKBuf, row: (Double, Long)): TopKBuf = {
    val (ahead, behind) = buf.rows.span(better(_, row))
    if (ahead.lengthCompare(k) >= 0) buf // full of strictly better rows
    else TopKBuf((ahead ::: row :: behind).take(k))
  }

  // output stays the buffer struct (column `rows` unwraps it in SQL —
  // `top.rows`): both encoders ride the public Encoders.product
  // derivation, no internal encoder API needed
  override def finish(buf: TopKBuf): TopKBuf = buf

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]

  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
