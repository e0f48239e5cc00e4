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

/** Heap state for [[TopKStrAgg]] (Long ids): a bounded binary
  * MAX-heap (root = worst kept element) over parallel arrays, so the
  * per-row cost on a saturated group is O(log k) — compare-to-root +
  * one sift — instead of the sorted list's O(k) walk (VERDICT r11 #7:
  * at k = 10⁴ on a crawl's dominant domain the walk IS the
  * aggregation). Arrays grow geometrically capped at k, so a small
  * group's partial serializes small (the encoder writes capacity
  * ≤ 2·n, never k). `n` is the live count; slots ≥ n are slack.
  *
  * Heap shape is NOT part of the contract — `finish` fully sorts —
  * so partials with different insertion orders produce the identical
  * result (the merge lemma the reservoir-merge gates pin).
  */
final case class TopKHeapLBuf(pris: Array[String], ids: Array[Long],
    n: Int)

/** Heap state for [[TopKStrIdAgg]] (String ids) — same discipline as
  * [[TopKHeapLBuf]], id tiebreak in UTF-16 code-unit order (≡ Spark
  * UTF8String binary order ≡ DuckDB VARCHAR on these keys).
  */
final case class TopKHeapSBuf(pris: Array[String], ids: Array[String],
    n: Int)

/** The two heap kernels. Deliberately twinned, not generic: the Long
  * variant must tiebreak NUMERICALLY (string order flips "10" vs "9")
  * and both run in the per-row hot path where boxing through a shared
  * comparator would cost what the heap just saved.
  */
private[functions] object TopKHeap {

  // ---- Long-id kernel ----

  def emptyL: TopKHeapLBuf =
    TopKHeapLBuf(new Array[String](0), new Array[Long](0), 0)

  private def worseL(p1: String, i1: Long, p2: String, i2: Long): Boolean = {
    val c = p1.compareTo(p2)
    c > 0 || (c == 0 && i1 > i2)
  }

  /** Multiset bottom-k insert: identical selection to the sorted-list
    * formulation (k smallest by (priority ASC, id ASC), duplicates
    * counted), in O(log k) on a full buffer instead of O(k).
    */
  def insertL(buf: TopKHeapLBuf, k: Int, pri: String,
      id: Long): TopKHeapLBuf = {
    if (buf.n < k) {
      val b =
        if (buf.n < buf.pris.length) buf
        else {
          val nc = math.min(k, math.max(8, buf.pris.length * 2))
          val np = new Array[String](nc); val ni = new Array[Long](nc)
          System.arraycopy(buf.pris, 0, np, 0, buf.n)
          System.arraycopy(buf.ids, 0, ni, 0, buf.n)
          TopKHeapLBuf(np, ni, buf.n)
        }
      b.pris(b.n) = pri; b.ids(b.n) = id
      var i = b.n
      while (i > 0) { // sift up
        val p = (i - 1) / 2
        if (worseL(b.pris(i), b.ids(i), b.pris(p), b.ids(p))) {
          swapL(b, i, p); i = p
        } else i = 0
      }
      b.copy(n = b.n + 1)
    } else if (worseL(buf.pris(0), buf.ids(0), pri, id)) {
      // strictly better than the worst kept row: replace the root
      buf.pris(0) = pri; buf.ids(0) = id
      var i = 0
      var done = false
      while (!done) { // sift down
        val l = 2 * i + 1; val r = l + 1; var m = i
        if (l < buf.n && worseL(buf.pris(l), buf.ids(l), buf.pris(m), buf.ids(m))) m = l
        if (r < buf.n && worseL(buf.pris(r), buf.ids(r), buf.pris(m), buf.ids(m))) m = r
        if (m == i) done = true else { swapL(buf, i, m); i = m }
      }
      buf
    } else buf
  }

  def mergeL(a: TopKHeapLBuf, b: TopKHeapLBuf, k: Int): TopKHeapLBuf = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    var acc = a; var i = 0
    while (i < b.n) { acc = insertL(acc, k, b.pris(i), b.ids(i)); i += 1 }
    acc
  }

  def sortedL(buf: TopKHeapLBuf): List[(String, Long)] =
    (0 until buf.n).map(i => (buf.pris(i), buf.ids(i)))
      .sortWith { case ((p1, i1), (p2, i2)) =>
        val c = p1.compareTo(p2); c < 0 || (c == 0 && i1 < i2)
      }.toList

  private def swapL(b: TopKHeapLBuf, i: Int, j: Int): Unit = {
    val tp = b.pris(i); b.pris(i) = b.pris(j); b.pris(j) = tp
    val ti = b.ids(i); b.ids(i) = b.ids(j); b.ids(j) = ti
  }

  // ---- String-id kernel ----

  def emptyS: TopKHeapSBuf =
    TopKHeapSBuf(new Array[String](0), new Array[String](0), 0)

  private def worseS(p1: String, i1: String, p2: String,
      i2: String): Boolean = {
    val c = p1.compareTo(p2)
    c > 0 || (c == 0 && i1.compareTo(i2) > 0)
  }

  def insertS(buf: TopKHeapSBuf, k: Int, pri: String,
      id: String): TopKHeapSBuf = {
    if (buf.n < k) {
      val b =
        if (buf.n < buf.pris.length) buf
        else {
          val nc = math.min(k, math.max(8, buf.pris.length * 2))
          val np = new Array[String](nc); val ni = new Array[String](nc)
          System.arraycopy(buf.pris, 0, np, 0, buf.n)
          System.arraycopy(buf.ids, 0, ni, 0, buf.n)
          TopKHeapSBuf(np, ni, buf.n)
        }
      b.pris(b.n) = pri; b.ids(b.n) = id
      var i = b.n
      while (i > 0) {
        val p = (i - 1) / 2
        if (worseS(b.pris(i), b.ids(i), b.pris(p), b.ids(p))) {
          swapS(b, i, p); i = p
        } else i = 0
      }
      b.copy(n = b.n + 1)
    } else if (worseS(buf.pris(0), buf.ids(0), pri, id)) {
      buf.pris(0) = pri; buf.ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1; var m = i
        if (l < buf.n && worseS(buf.pris(l), buf.ids(l), buf.pris(m), buf.ids(m))) m = l
        if (r < buf.n && worseS(buf.pris(r), buf.ids(r), buf.pris(m), buf.ids(m))) m = r
        if (m == i) done = true else { swapS(buf, i, m); i = m }
      }
      buf
    } else buf
  }

  def mergeS(a: TopKHeapSBuf, b: TopKHeapSBuf, k: Int): TopKHeapSBuf = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    var acc = a; var i = 0
    while (i < b.n) { acc = insertS(acc, k, b.pris(i), b.ids(i)); i += 1 }
    acc
  }

  def sortedS(buf: TopKHeapSBuf): List[(String, String)] =
    (0 until buf.n).map(i => (buf.pris(i), buf.ids(i)))
      .sortWith { case ((p1, i1), (p2, i2)) =>
        val c = p1.compareTo(p2); c < 0 || (c == 0 && i1.compareTo(i2) < 0)
      }.toList

  private def swapS(b: TopKHeapSBuf, i: Int, j: Int): Unit = {
    val tp = b.pris(i); b.pris(i) = b.pris(j); b.pris(j) = tp
    val ti = b.ids(i); b.ids(i) = b.ids(j); b.ids(j) = ti
  }
}

/** Per-group bottom-k by (string priority ASC, id ASC) as a typed
  * [[Aggregator]]: bounded map-side partials — ≤ k rows per (group,
  * task) cross the exchange — where the window formulation sorts
  * EVERY row of every group inside one task per group. With a
  * handful of groups (per-language sampling over a real crawl: half
  * the corpus is one language) that single task IS the job; this
  * aggregator is the difference between a stratum-wide sort and a
  * fixed-size-sketch shuffle. Registered via
  * `functions.udaf(new TopKStrAgg(k))`. Buffer is the O(log k)
  * bounded heap ([[TopKHeapLBuf]]); output is the sorted list, as
  * before the heap swap.
  */
final class TopKStrAgg(k: Int)
    extends Aggregator[(String, Long), TopKHeapLBuf, TopKStrBuf] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def zero: TopKHeapLBuf = TopKHeap.emptyL

  override def reduce(buf: TopKHeapLBuf, row: (String, Long)): TopKHeapLBuf =
    TopKHeap.insertL(buf, k, row._1, row._2)

  override def merge(a: TopKHeapLBuf, b: TopKHeapLBuf): TopKHeapLBuf =
    TopKHeap.mergeL(a, b, k)

  override def finish(buf: TopKHeapLBuf): TopKStrBuf =
    TopKStrBuf(TopKHeap.sortedL(buf))

  override def bufferEncoder: Encoder[TopKHeapLBuf] =
    Encoders.product[TopKHeapLBuf]

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
    extends Aggregator[(String, String), TopKHeapSBuf, TopKStrIdBuf] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def zero: TopKHeapSBuf = TopKHeap.emptyS

  override def reduce(buf: TopKHeapSBuf,
      row: (String, String)): TopKHeapSBuf =
    TopKHeap.insertS(buf, k, row._1, row._2)

  override def merge(a: TopKHeapSBuf, b: TopKHeapSBuf): TopKHeapSBuf =
    TopKHeap.mergeS(a, b, k)

  override def finish(buf: TopKHeapSBuf): TopKStrIdBuf =
    TopKStrIdBuf(TopKHeap.sortedS(buf))

  override def bufferEncoder: Encoder[TopKHeapSBuf] =
    Encoders.product[TopKHeapSBuf]

  override def outputEncoder: Encoder[TopKStrIdBuf] =
    Encoders.product[TopKStrIdBuf]
}
