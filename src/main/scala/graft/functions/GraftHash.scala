package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass document-hash kernels for the dedup operators.
  *
  * The composed-builtin plans (explode tokens → 64 partial sums for
  * SimHash; explode shingles → 8 string-min aggregates for MinHash)
  * are correct and map-side combinable, but they pay an explode, a
  * wide aggregation buffer, and a shuffle per document table. These
  * kernels compute the same signatures in ONE pass over each row —
  * no explode, no aggregation, no exchange: the signature becomes a
  * plain projected column, computed wherever the scan runs. At 100 TB
  * that is the difference between "a shuffle of every token in the
  * corpus" and "no shuffle at all" for the signature stage.
  *
  * Semantics are bit-identical to the composed plans (spec-enforced):
  * tokens are `split(text, ' ')` (Java regex semantics, trailing empty
  * strings kept), hashes are md5 over UTF-8 bytes, min is taken in
  * unsigned digest order — the same order as the lowercase-hex string
  * min the oracle SQL computes, so the DuckDB gate replays unchanged.
  */
object GraftHash {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Split on single spaces with Java `split(" ", -1)` semantics, i.e.
    * what `org.apache.spark.sql.functions.split(col, " ")` produces:
    * consecutive separators yield empty tokens and trailing empties are
    * kept (Spark passes limit -1).
    */
  private[functions] def tokenize(text: UTF8String): Array[String] =
    text.toString.split(" ", -1)

  /** 64-bit SimHash over the whitespace token multiset: per token, the
    * first 8 bytes of md5 vote ±1 on each of 64 bits (bit j reads nibble
    * j/4, mask 1<<(j%4) — hex-nibble order, matching the oracle's
    * `conv(substring(md5(w), j/4+1, 1), 16, 10)` extraction); positive
    * vote sums set the bit in the packed two's-complement long.
    */
  def simhash64(text: UTF8String): Long = {
    val votes = new Array[Int](64)
    val md = md5.get()
    val toks = tokenize(text)
    var t = 0
    while (t < toks.length) {
      md.reset()
      val d = md.digest(toks(t).getBytes("UTF-8"))
      var j = 0
      while (j < 64) {
        // nibble j/4 of the hex string = high nibble of byte j/8 when
        // (j/4) is even, low nibble when odd
        val byteIdx = j >> 3
        val nib =
          if (((j >> 2) & 1) == 0) (d(byteIdx) >> 4) & 0xF
          else d(byteIdx) & 0xF
        if (((nib >> (j & 3)) & 1) == 1) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      t += 1
    }
    var packed = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) packed |= (1L << j)
      j += 1
    }
    packed
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned lexicographic digest comparison ≡ lowercase-hex string
    * order (each hex char encodes 4 bits in order).
    */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** k consecutive tokens joined by a single space — THE shingle/window
    * format every md5-hashing kernel and the DuckDB oracles share (one
    * definition; a delimiter change here is the only place to make it).
    */
  private def joinWindow(sb: java.lang.StringBuilder, toks: Array[String],
                         i: Int, k: Int): String = {
    sb.setLength(0)
    var j = 0
    while (j < k) {
      if (j > 0) sb.append(' ')
      sb.append(toks(i + j))
      j += 1
    }
    sb.toString
  }

  /** MinHash signature: for seed i in [0, seeds), the minimum of
    * md5(s"$i:" + shingle) over the document's k-token shingles
    * (shingle = k consecutive tokens joined by ' '), returned as
    * lowercase hex — exactly `min(md5(concat('i:', s)))` over the
    * shingle inverted index. Duplicate shingles cannot change a min, so
    * the index's `distinct()` needs no replication here. Documents with
    * fewer than k tokens have no shingles: null (the composed plan
    * drops them; callers filter `size >= k` to match).
    */
  def minhashSig(text: UTF8String, k: Int, seeds: Int): ArrayData = {
    val toks = tokenize(text)
    if (toks.length < k) return null
    val mins = new Array[Array[Byte]](seeds)
    val md = md5.get()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - k) {
      val shingleBytes = joinWindow(sb, toks, i, k).getBytes("UTF-8")
      var s = 0
      while (s < seeds) {
        md.reset()
        md.update(String.valueOf(s).getBytes("UTF-8"))
        md.update(':'.toByte)
        md.update(shingleBytes)
        val d = md.digest()
        if (mins(s) == null || less(d, mins(s))) mins(s) = d
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(toHex(_).asInstanceOf[Any]))
  }

  /** DISTINCT k-token shingles per row, first-occurrence order (the
    * `array_distinct(transform(sequence, i -> concat_ws(slice)))`
    * composition as one generated call) — the inverted-index feed of
    * every shingle-based dedup operator. Null below k tokens.
    */
  def tokenShingles(text: UTF8String, k: Int): ArrayData = {
    val toks = tokenize(text)
    if (toks.length < k) return null
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - k) {
      seen.add(UTF8String.fromString(joinWindow(sb, toks, i, k)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** md5 hex of every stride-1 k-token window — the window table of
    * the exact-substring dedup pass, computed in one generated call
    * instead of an interpreted `transform(sequence, i -> md5(concat_ws(
    * slice)))` chain. Shares [[joinWindow]] with [[minhashSig]] (k
    * tokens joined by ' ', md5 over UTF-8, lowercase hex) so the DuckDB
    * oracle replays unchanged. Deliberately a FULL md5 per window, not
    * a true rolling hash — O(n·k) bytes hashed per document instead of
    * O(n) — because the cross-engine oracle needs a hash both engines
    * implement; a production profile would swap in a rolling polynomial
    * (same plan shape, same trade as fastMinhashCandidatePairs). Null
    * below k tokens.
    */
  def tokenWindowHashes(text: UTF8String, k: Int): ArrayData = {
    val toks = tokenize(text)
    if (toks.length < k) return null
    val md = md5.get()
    val sb = new java.lang.StringBuilder()
    val out = new Array[Any](toks.length - k + 1)
    var i = 0
    while (i <= toks.length - k) {
      md.reset()
      out(i) = toHex(md.digest(joinWindow(sb, toks, i, k).getBytes("UTF-8")))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Rolling-polynomial window hashes — the PRODUCTION profile of
    * [[tokenWindowHashes]]: each token's bytes are hashed ONCE (64-bit
    * FNV-1a), and the k-token window hash is the degree-(k−1)
    * polynomial Σ_j h(tok_{i+j})·B^(k−1−j) in natural mod-2⁶⁴
    * arithmetic, advanced in O(1) per stride — O(n) bytes hashed per
    * document vs the md5 profile's O(n·k). Not cross-engine-replayable
    * (no shared hash with DuckDB), which is exactly why the GATE query
    * stays on md5; the equivalence spec pins both profiles to the same
    * flagged-span sets. 64-bit collisions across a window table are
    * ~n²∕2⁶⁴ — negligible at any corpus a single table holds.
    */
  def tokenWindowHashesRolling(text: UTF8String, k: Int): ArrayData = {
    val toks = tokenize(text)
    if (toks.length < k) return null
    val B = 0x100000001b3L // FNV prime doubles as the polynomial base
    // per-token 64-bit FNV-1a: every byte of the document hashed once
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      // explicit UTF-8, like every other kernel here: the platform
      // default charset differs across JVMs (POSIX locale → US-ASCII),
      // which would hash the same token differently per executor
      val bytes = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < bytes.length) { h ^= bytes(j) & 0xffL; h *= B; j += 1 }
      th(i) = h
      i += 1
    }
    var bk = 1L // B^(k-1), the roll-out coefficient
    i = 1
    while (i < k) { bk *= B; i += 1 }
    val out = new Array[Any](toks.length - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + th(i); i += 1 }
    out(0) = h
    i = 1
    while (i <= toks.length - k) {
      h = (h - th(i - 1) * bk) * B + th(i + k - 1)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-row n-gram COUNTS, sorted by gram: the (g, tf) pairs
    * `explode(charNgrams) → groupBy(doc, g).count` would produce, but
    * computed inside the row — so the langId tf table needs NO explode
    * of raw gram occurrences and NO aggregation shuffle at all (the
    * explode emits pre-counted pairs, ~2× fewer rows, zero exchanges).
    * Deterministic order (TreeMap) so downstream arrays are stable.
    */
  def charNgramCounts(text: UTF8String, n: Int): ArrayData = {
    val len = text.numChars()
    if (len < n) return null
    val m = new java.util.TreeMap[UTF8String, Integer]()
    var i = 0
    while (i <= len - n) {
      val g = text.substring(i, i + n)
      val c = m.get(g)
      m.put(g, if (c == null) 1 else c + 1)
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue.intValue()))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Character n-grams by code point: identical output to the composed
    * `transform(sequence(1, length(text) - n + 1), i -> substring(text,
    * i, n))` (higher-order functions evaluate through CodegenFallback
    * with a lambda dispatch + int-array materialisation per row; this
    * is one generated call). Null for texts shorter than n — callers
    * filter, as with [[minhashSig]].
    */
  def charNgrams(text: UTF8String, n: Int): ArrayData = {
    val len = text.numChars()
    if (len < n) return null
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      out(i) = text.substring(i, i + n)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `char_ngrams(text, n)`: code-point n-gram array — the language-ID
  * feature extractor behind `TextOps.charTrigrams`. Null for texts with
  * fewer than n characters (callers filter, mirroring [[MinhashSig]]).
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"char_ngrams needs n >= 1, got $n")

  override def nullable: Boolean = true // < n chars → no n-grams

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams needs a string argument, got ${t.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else GraftHash.charNgrams(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.GraftHash.charNgrams($c, $n);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

/** `char_ngram_counts(text, n)`: sorted (g, tf) n-gram count pairs —
  * the pre-aggregated form of [[CharNgrams]] (spec-checked equivalent
  * to explode + group-count). Null below n characters, like its
  * siblings.
  */
case class CharNgramCounts(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"char_ngram_counts needs n >= 1, got $n")

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("g", StringType, nullable = false),
    StructField("tf", IntegerType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_counts needs a string argument, got ${t.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else GraftHash.charNgramCounts(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.GraftHash.charNgramCounts($c, $n);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharNgramCounts =
    copy(child = newChild)
}

/** `token_window_hashes(text, k)`: md5 hex per stride-1 k-token window
  * (the substring-dedup window table). Null below k tokens — callers
  * filter, mirroring [[MinhashSig]].
  */
case class TokenWindowHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"token_window_hashes needs k >= 1, got $k")

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_window_hashes needs a string argument, got ${t.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else GraftHash.tokenWindowHashes(v.asInstanceOf[UTF8String], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.GraftHash.tokenWindowHashes($c, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHashes =
    copy(child = newChild)
}

/** `token_window_hashes_rolling(text, k)`: 64-bit rolling-polynomial
  * hash per stride-1 k-token window — the O(n)-bytes-hashed production
  * profile of [[TokenWindowHashes]] (see
  * [[GraftHash.tokenWindowHashesRolling]]). Null below k tokens.
  */
case class TokenWindowHashesRolling(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"token_window_hashes_rolling needs k >= 1, got $k")

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_window_hashes_rolling needs a string argument, got ${t.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else GraftHash.tokenWindowHashesRolling(v.asInstanceOf[UTF8String], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.GraftHash.tokenWindowHashesRolling($c, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHashesRolling =
    copy(child = newChild)
}

/** `token_shingles(text, k)`: distinct k-token shingles in
  * first-occurrence order — the shingle inverted-index feed. Null
  * below k tokens, like its siblings.
  */
case class TokenShingles(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"token_shingles needs k >= 1, got $k")

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_shingles needs a string argument, got ${t.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else GraftHash.tokenShingles(v.asInstanceOf[UTF8String], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.GraftHash.tokenShingles($c, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
}

/** `simhash64(text)`: packed 64-bit SimHash of the whitespace token
  * multiset — the one-pass kernel behind `TextOps.simhash`.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs a string argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    GraftHash.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `minhash_sig(text)`: the md5 MinHash signature (array of `seeds`
  * lowercase-hex minima over k-token shingles). Null for documents with
  * fewer than k tokens — callers filter those out, as the inverted-index
  * plan does implicitly.
  */
case class MinhashSig(child: Expression, k: Int, seeds: Int)
    extends UnaryExpression {

  override def nullable: Boolean = true // < k tokens → no shingles

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs a string argument, got ${t.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else GraftHash.minhashSig(v.asInstanceOf[UTF8String], k, seeds)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.GraftHash.minhashSig($c, $k, $seeds);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}
