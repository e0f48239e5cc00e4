package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Bounded bottom-k buffer over a STRING priority: `rows` is sorted by
  * (priority ASC, id ASC) and never longer than k — [[TopKAgg]]'s
  * shape for the hash-ordered sampling operators, whose total order is
  * an md5 HEX STRING (lexicographic on lowercase hex = numeric order
  * of the full 128-bit value; collapsing it to a double would truncate
  * to 52 bits and reorder colliding prefixes against the SQL oracle).
  */
final case class TopKStrBuf(rows: List[(String, Long)])

/** Per-group bottom-k by (string priority ASC, id ASC) as a typed
  * [[Aggregator]]: bounded map-side partials — ≤ k rows per (group,
  * task) cross the exchange — where the window formulation sorts
  * EVERY row of every group inside one task per group. With a
  * handful of groups (per-language sampling over a real crawl: half
  * the corpus is one language) that single task IS the job; this
  * aggregator is the difference between a stratum-wide sort and a
  * fixed-size-sketch shuffle. Registered via
  * `functions.udaf(new TopKStrAgg(k))`.
  *
  * The string order is Scala's `String.compareTo` — per-char UTF-16
  * code-unit comparison, identical to Spark's UTF8String binary
  * ordering and DuckDB's default VARCHAR collation on the ASCII hex
  * alphabet these priorities live in.
  */
final class TopKStrAgg(k: Int)
    extends Aggregator[(String, Long), TopKStrBuf, TopKStrBuf] {

  require(k > 0, s"top-k needs k > 0, got $k")

  // priority asc, id asc — the total order shared with the SQL oracle
  private def better(a: (String, Long), b: (String, Long)): Boolean = {
    val c = a._1.compareTo(b._1)
    c < 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: TopKStrBuf = TopKStrBuf(Nil)

  override def reduce(buf: TopKStrBuf, row: (String, Long)): TopKStrBuf =
    insert(buf, row)

  override def merge(a: TopKStrBuf, b: TopKStrBuf): TopKStrBuf =
    b.rows.foldLeft(a)(insert)

  /** Insert into the sorted-ascending bounded buffer. */
  private def insert(buf: TopKStrBuf, row: (String, Long)): TopKStrBuf = {
    val (ahead, behind) = buf.rows.span(better(_, row))
    if (ahead.lengthCompare(k) >= 0) buf // full of strictly better rows
    else TopKStrBuf((ahead ::: row :: behind).take(k))
  }

  override def finish(buf: TopKStrBuf): TopKStrBuf = buf

  override def bufferEncoder: Encoder[TopKStrBuf] = Encoders.product[TopKStrBuf]

  override def outputEncoder: Encoder[TopKStrBuf] = Encoders.product[TopKStrBuf]
}
