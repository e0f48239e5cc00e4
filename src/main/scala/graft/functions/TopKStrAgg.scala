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

/** [[TopKStrAgg]]'s buffer with the id carried as a STRING — the
  * any-orderable-id face of the grouped sampling operators (VERDICT
  * r10 #7): the id rides in its canonical string-cast form, which is
  * the SAME form the md5 priority is computed over everywhere
  * ([[graft.operators.ReservoirStore.priorityFor]] casts the id to
  * string before hashing), so admitting it as the partial's id adds
  * no new injectivity assumption.
  */
final case class TopKStrIdBuf(rows: List[(String, String)])

/** Per-group bottom-k by (string priority ASC, string id ASC) — the
  * [[TopKStrAgg]] shape with a string id, for corpora keyed by
  * non-BIGINT ids (url/content-hash keys). The tiebreak is string
  * order of the id's canonical cast — deterministic for any atomic
  * id, engine-portable (UTF8String binary order ≡ DuckDB VARCHAR on
  * these keys), and reachable only under an md5 collision anyway.
  */
final class TopKStrIdAgg(k: Int)
    extends Aggregator[(String, String), TopKStrIdBuf, TopKStrIdBuf] {

  require(k > 0, s"top-k needs k > 0, got $k")

  private def better(a: (String, String), b: (String, String)): Boolean = {
    val c = a._1.compareTo(b._1)
    c < 0 || (c == 0 && a._2.compareTo(b._2) < 0)
  }

  override def zero: TopKStrIdBuf = TopKStrIdBuf(Nil)

  override def reduce(buf: TopKStrIdBuf,
      row: (String, String)): TopKStrIdBuf = insert(buf, row)

  override def merge(a: TopKStrIdBuf, b: TopKStrIdBuf): TopKStrIdBuf =
    b.rows.foldLeft(a)(insert)

  private def insert(buf: TopKStrIdBuf,
      row: (String, String)): TopKStrIdBuf = {
    val (ahead, behind) = buf.rows.span(better(_, row))
    if (ahead.lengthCompare(k) >= 0) buf
    else TopKStrIdBuf((ahead ::: row :: behind).take(k))
  }

  override def finish(buf: TopKStrIdBuf): TopKStrIdBuf = buf

  override def bufferEncoder: Encoder[TopKStrIdBuf] =
    Encoders.product[TopKStrIdBuf]

  override def outputEncoder: Encoder[TopKStrIdBuf] =
    Encoders.product[TopKStrIdBuf]
}
