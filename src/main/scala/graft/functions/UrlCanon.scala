package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass URL canonicalization kernel — the fused form of
  * [[graft.operators.WebOps.canonicalizeUrl]]'s ~15-op string-algebra
  * tree (VERDICT r11 #4: at 100 B URLs the canonicalizer is the hot
  * path of the whole curation layer; the algebra probed at
  * 0.27 M rows/s/box). The ALGEBRA REMAINS THE SPECIFICATION — the
  * oracle replays it op-for-op and the `url_canon` gate pins this
  * kernel against it byte-for-byte — so every step here references
  * the algebra op it reproduces, including its exact edge semantics:
  *
  *  - scheme: the anchored `(?i)^https?://` recognizer (non-http →
  *    NULL, like the algebra's `when(isHttpUrl...)`);
  *  - authority ends at the first of '/', '?', '#';
  *  - userinfo: everything up to the LAST '@' drops
  *    (`substring_index(auth, '@', -1)`);
  *  - host: Spark's `lower` (UTF8String.toLowerCase — NOT
  *    java.lang.String.toLowerCase, whose default-locale casing
  *    diverges on Turkish dotless-i inputs), then trailing '.'s
  *    strip (`rtrim(host, '.')`); a BRACKETED IP literal keeps its
  *    brackets and splits host:port after the ']' (VERDICT r12 #1 —
  *    no dot strip inside brackets);
  *  - port: text after the first ':' of host[:port] (after ']' for
  *    bracket hosts); dropped when it is its scheme's default;
  *  - path and query: percent-encoding normalized ([[UrlCanon
  *    .pctNormalize]] — unreserved `%XX` decodes, other valid
  *    escapes uppercase their hex, bare '%' stays literal), BEFORE
  *    the query split/filter/sort;
  *  - query: split on '&' KEEPING empty tokens (Spark's split is
  *    limit = -1), drop empties and tracking params (`utm_*` prefix
  *    + the exact [[UrlCanon.TrackingParams]] names, both
  *    case-sensitive like the algebra's startsWith/isin), sort the
  *    rest in UTF-8 BINARY order (array_sort's UTF8String ordering,
  *    which differs from String.compareTo's UTF-16 order above the
  *    BMP), join with '&';
  *  - empty path → '/'.
  */
object UrlCanon {

  /** Tracking query parameters dropped by canonicalization (shared
    * with the algebra via `WebOps.TrackingParams`). Frozen set —
    * growing it changes every canonical form.
    */
  val TrackingParams: Seq[String] = Seq(
    "fbclid", "gclid", "msclkid", "yclid", "igshid", "mc_cid",
    "mc_eid", "ref", "ref_src", "s_kwcid", "spm")

  private val trackingSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TrackingParams.foreach(s.add)
    s
  }

  /** `(?i)^https?://` without the regex engine. */
  def isHttp(s: String): Boolean = {
    val n = s.length
    if (n < 7) return false
    val c0 = s.charAt(0); val c1 = s.charAt(1)
    val c2 = s.charAt(2); val c3 = s.charAt(3)
    if ((c0 != 'h' && c0 != 'H') || (c1 != 't' && c1 != 'T') ||
      (c2 != 't' && c2 != 'T') || (c3 != 'p' && c3 != 'P')) return false
    val c4 = s.charAt(4)
    if (c4 == ':') s.startsWith("://", 4)
    else if ((c4 == 's' || c4 == 'S') && n >= 8) s.startsWith("://", 5)
    else false
  }

  /** Spark's `lower`, exactly: UTF8String.toLowerCase (ASCII fast
    * path, then JVM casing) — NOT String.toLowerCase, which applies
    * the default locale.
    */
  private def sparkLower(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  /** UTF-8 binary order — `array_sort`'s UTF8String comparison. */
  private def utf8Compare(a: String, b: String): Int = {
    val ba = a.getBytes(StandardCharsets.UTF_8)
    val bb = b.getBytes(StandardCharsets.UTF_8)
    val n = math.min(ba.length, bb.length)
    var i = 0
    while (i < n) {
      val c = (ba(i) & 0xff) - (bb(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    ba.length - bb.length
  }

  private val utf8Order: java.util.Comparator[String] =
    new java.util.Comparator[String] {
      override def compare(a: String, b: String): Int = utf8Compare(a, b)
    }

  /** Param name = text before the first '=' (the whole param when
    * there is none) — `substring_index(p, "=", 1)`.
    */
  private def isTracking(p: String): Boolean = {
    val eq = p.indexOf('=')
    val name = if (eq >= 0) p.substring(0, eq) else p
    name.startsWith("utm_") || trackingSet.contains(name)
  }

  /** Parsed (scheme, host, port, path0, qstr) of an http(s) URL —
    * null for non-http input. One pass, shared by canonicalize/host.
    *
    * IP-literal hosts (VERDICT r12 #1): a bracketed IPv6 authority
    * (`[2001:db8::1]:8080`) splits host:port at the FIRST ':' AFTER
    * the closing `]` — splitting at the first ':' of the string
    * would collapse every IPv6 URL on the web into host `"["`. The
    * bracket host keeps its brackets (lowercased — hex digits and
    * the brackets are caseable-safe); no trailing-dot strip applies
    * inside brackets (an IPv6 literal cannot carry a root label).
    * Degenerate shapes stay deterministic: an UNCLOSED `[` takes the
    * whole host[:port] text as the host (no port — a ':' inside a
    * half-open bracket is ambiguous), and non-`:` text after `]` is
    * dropped (garbage authority; collapsing it keeps canonical forms
    * total).
    */
  private def parse(s: String): (String, String, String, String, String) = {
    if (!isHttp(s)) return null
    val schemeLen = if (s.charAt(4) == ':') 4 else 5
    val scheme = if (schemeLen == 4) "http" else "https"
    val rest = s.substring(schemeLen + 3)
    val hash = rest.indexOf('#')
    val noFrag = if (hash >= 0) rest.substring(0, hash) else rest
    var aEnd = 0
    val nf = noFrag.length
    while (aEnd < nf && noFrag.charAt(aEnd) != '/' &&
      noFrag.charAt(aEnd) != '?') aEnd += 1
    val authority = noFrag.substring(0, aEnd)
    val pathq = noFrag.substring(aEnd)
    val q = pathq.indexOf('?')
    val path0 = if (q >= 0) pathq.substring(0, q) else pathq
    val qstr = if (q >= 0) pathq.substring(q + 1) else ""
    val at = authority.lastIndexOf('@')
    val hostPort = if (at >= 0) authority.substring(at + 1) else authority
    if (hostPort.startsWith("[")) {
      // bracketed IP literal: host:port splits after ']'
      val br = hostPort.indexOf(']')
      if (br < 0) return (scheme, sparkLower(hostPort), "", path0, qstr)
      val host = sparkLower(hostPort.substring(0, br + 1))
      val restHp = hostPort.substring(br + 1)
      val port =
        if (restHp.startsWith(":")) restHp.substring(1) else ""
      return (scheme, host, port, path0, qstr)
    }
    val colon = hostPort.indexOf(':')
    val hostRaw = if (colon >= 0) hostPort.substring(0, colon) else hostPort
    val port = if (colon >= 0) hostPort.substring(colon + 1) else ""
    var host = sparkLower(hostRaw)
    var hEnd = host.length
    while (hEnd > 0 && host.charAt(hEnd - 1) == '.') hEnd -= 1
    if (hEnd < host.length) host = host.substring(0, hEnd)
    (scheme, host, port, path0, qstr)
  }

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else -1

  /** RFC 3986 §2.3 unreserved byte — the escapes percent-decoding
    * may collapse without changing the resource.
    */
  private def isUnreservedByte(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') ||
      v == '-' || v == '.' || v == '_' || v == '~'

  /** Percent-encoding normalization (RFC 3986 §6.2.2.2 — VERDICT r12
    * #3), applied to the PATH and QUERY components: a valid `%XX`
    * escape of an UNRESERVED byte decodes to the literal character
    * (`%7E`/`%7e` and `~` are the same resource — without this, the
    * most common URL spelling variance after case defeats dedup and
    * prefix blocklists); any other valid escape keeps its `%` with
    * the hex pair UPPERCASED (§6.2.2.1 — `%2f` ≡ `%2F`); a `%` not
    * followed by two hex digits stays literal (crawl reality; a
    * strict parser would reject, a canonicalizer must stay total).
    * The host is deliberately untouched: %-escapes in hosts are
    * vanishingly rare and interact with IDN — documented as
    * out of scope beside the punycode decision.
    */
  def pctNormalize(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n) {
        val h1 = hexVal(s.charAt(i + 1))
        val h2 = hexVal(s.charAt(i + 2))
        if (h1 >= 0 && h2 >= 0) {
          val v = h1 * 16 + h2
          if (isUnreservedByte(v)) sb.append(v.toChar)
          else {
            sb.append('%')
            sb.append(Character.toUpperCase(s.charAt(i + 1)))
            sb.append(Character.toUpperCase(s.charAt(i + 2)))
          }
          i += 3
        } else { sb.append('%'); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def canonicalize(u: UTF8String): UTF8String = {
    if (u == null) return null
    val p = parse(u.toString)
    if (p == null) return null
    val (scheme, host, port, path0raw, qstrRaw) = p
    // percent normalization BEFORE the param split/filter/sort: a
    // decoded unreserved byte is never '&'/'=' so the structure is
    // stable, and a %-spelled tracking name (%75tm_x) must be caught
    val path0 = pctNormalize(path0raw)
    val qstr = pctNormalize(qstrRaw)
    val keepPort = port.nonEmpty &&
      !(scheme == "http" && port == "80") &&
      !(scheme == "https" && port == "443")
    val toks = qstr.split("&", -1)
    var nKept = 0
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty && !isTracking(toks(i))) {
        toks(nKept) = toks(i); nKept += 1
      }
      i += 1
    }
    val kept = java.util.Arrays.copyOf(toks, nKept)
    java.util.Arrays.sort(kept, utf8Order)
    val sb = new java.lang.StringBuilder(u.numChars() + 4)
    sb.append(scheme).append("://").append(host)
    if (keepPort) sb.append(':').append(port)
    if (path0.isEmpty) sb.append('/') else sb.append(path0)
    if (nKept > 0) {
      sb.append('?')
      i = 0
      while (i < nKept) {
        if (i > 0) sb.append('&')
        sb.append(kept(i)); i += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  def host(u: UTF8String): UTF8String = {
    if (u == null) return null
    val p = parse(u.toString)
    if (p == null) return null
    UTF8String.fromString(p._2)
  }
}

/** `canonicalize_url(url)`: the fused codegen canonicalizer — one
  * expression, one parse, byte-identical to the string-algebra
  * specification (the `url_canon` gate pins the equivalence against
  * the oracle's algebra replay). Non-http → NULL.
  */
case class CanonicalizeUrl(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"canonicalize_url needs a string argument, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    UrlCanon.canonicalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlCanon.canonicalize($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): CanonicalizeUrl = copy(child = newChild)
}

/** `url_host(url)`: fused lowercased host (userinfo and trailing
  * dots stripped) of an http(s) URL — the kernel behind the domain
  * grouping key. Non-http → NULL.
  */
case class UrlHostExpr(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"url_host needs a string argument, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    UrlCanon.host(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlCanon.host($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): UrlHostExpr = copy(child = newChild)
}
