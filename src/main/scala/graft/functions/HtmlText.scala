package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Quote-state HTML → text scanner — the EXACT extraction leg beside
  * the regex pipeline (`WebOps.stripHtml`), closing the two defects
  * inherent to the regex family (VERDICT r11 #6):
  *
  *  - **attribute `>` leak**: `<a title="x > y">link</a>` — the regex
  *    tag pattern ends at the FIRST '>', leaking `y">` into the text;
  *    the scanner tracks quote state inside tags, so a quoted '>'
  *    never terminates one;
  *  - **bare `<` swallowing**: `price < 100 ... >` — the regex treats
  *    the span as a tag and swallows prose; the scanner only opens a
  *    tag when '<' is followed by a letter, '/', '!' or '?' (the
  *    HTML5 tag-open grammar), emitting a lone '<' as text.
  *
  * Shared semantics with the regex pipeline (byte-identical on
  * well-formed HTML — the `html_strip_scan` gate pins that against
  * the regex-replaying oracle):
  *
  *  - comments (`<!-- … -->`) and `<script>`/`<style>` elements drop
  *    WITH their content; every dropped element counts as one space;
  *  - other tags become a single space;
  *  - the six entities decode (`&lt; &gt; &quot; &#39; &nbsp;
  *    &amp;`), each exactly once left-to-right — decoded characters
  *    are literal output, never re-parsed, so `&amp;lt;` yields the
  *    text `&lt;` on both legs;
  *  - whitespace (the Java `\s` set) collapses to single spaces,
  *    output trimmed.
  *
  * Deliberate divergences where the scanner follows the browser and
  * the regex leg is wrong (spec-pinned, since no SQL oracle can
  * replay a scanner): an unterminated comment, tag, script or style
  * swallows to end-of-input (the regex leaves the raw markup in the
  * text — markup-as-prose is strictly worse training data than
  * truncation); and a custom element whose name merely EXTENDS
  * script/style (`<script-loader>` — hyphenated custom-element
  * names are well-formed HTML5) is a generic tag here, while the
  * regex's `\b` matches its OPEN tag at the hyphen, so a later bare
  * `</script>` lets the regex swallow the element's prose.
  */
object HtmlText {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** Case-insensitive element-name match at `pos` with the `\b` the
    * regex leg requires: the name must be followed by whitespace,
    * '>', '/' or end-of-input.
    */
  private def matchesElement(s: String, pos: Int, name: String): Boolean = {
    if (pos + name.length > s.length) return false
    var i = 0
    while (i < name.length) {
      val c = s.charAt(pos + i)
      if (Character.toLowerCase(c) != name.charAt(i)) return false
      i += 1
    }
    val after = pos + name.length
    after >= s.length || isWs(s.charAt(after)) ||
      s.charAt(after) == '>' || s.charAt(after) == '/'
  }

  /** Index just past the tag's closing UNQUOTED '>' (quote state is
    * the point of the scanner); end-of-input when unterminated.
    */
  private def skipTag(s: String, from: Int): Int = {
    var j = from + 1
    var q: Char = 0
    while (j < s.length) {
      val c = s.charAt(j)
      if (q != 0) { if (c == q) q = 0 }
      else if (c == '"' || c == '\'') q = c
      else if (c == '>') return j + 1
      j += 1
    }
    s.length
  }

  /** Index of the element's CLOSE tag (`</name`, case-insensitive)
    * with the end-tag name boundary HTML5 requires: the char after
    * the name must be whitespace, '/', '>' or end-of-input —
    * `</scripty>` inside a script is script DATA, not a close tag
    * (review finding: without the boundary, a longer tag name would
    * terminate the element early and leak script/CSS into the text —
    * the exact defect class this scanner exists to close).
    */
  private def findCloseTag(s: String, name: String, from: Int): Int = {
    val target = "</" + name
    val n = s.length - target.length
    var i = math.max(from, 0)
    while (i <= n) {
      if (s.regionMatches(true, i, target, 0, target.length)) {
        val after = i + target.length
        if (after >= s.length || isWs(s.charAt(after)) ||
          s.charAt(after) == '>' || s.charAt(after) == '/') return i
      }
      i += 1
    }
    -1
  }

  def extract(h: UTF8String): UTF8String = {
    if (h == null) return null
    val s = h.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var pendingWs = false
    def emit(c: Char): Unit =
      if (isWs(c)) pendingWs = true
      else {
        if (pendingWs && out.length > 0) out.append(' ')
        pendingWs = false
        out.append(c)
      }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          pendingWs = true
        } else if (i + 1 < n && (isAsciiLetter(s.charAt(i + 1)) ||
            s.charAt(i + 1) == '/' || s.charAt(i + 1) == '!' ||
            s.charAt(i + 1) == '?')) {
          if (matchesElement(s, i + 1, "script")) {
            val afterOpen = skipTag(s, i)
            val close = findCloseTag(s, "script", afterOpen)
            i = if (close < 0) n else skipTag(s, close)
          } else if (matchesElement(s, i + 1, "style")) {
            val afterOpen = skipTag(s, i)
            val close = findCloseTag(s, "style", afterOpen)
            i = if (close < 0) n else skipTag(s, close)
          } else {
            i = skipTag(s, i)
          }
          pendingWs = true
        } else {
          // bare '<' in prose: literal text, never a swallow
          emit('<'); i += 1
        }
      } else if (c == '&') {
        if (s.startsWith("&lt;", i)) { emit('<'); i += 4 }
        else if (s.startsWith("&gt;", i)) { emit('>'); i += 4 }
        else if (s.startsWith("&quot;", i)) { emit('"'); i += 6 }
        else if (s.startsWith("&#39;", i)) { emit('\''); i += 5 }
        else if (s.startsWith("&nbsp;", i)) { emit(' '); i += 6 }
        else if (s.startsWith("&amp;", i)) { emit('&'); i += 5 }
        else { emit('&'); i += 1 }
      } else {
        emit(c); i += 1
      }
    }
    UTF8String.fromString(out.toString)
  }
}

/** `html_text_scan(html)`: the exact quote-state HTML → text scanner
  * as a codegen expression. Null in → null out.
  */
case class HtmlTextScan(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"html_text_scan needs a string argument, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    HtmlText.extract(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlText.extract($c)")

  override protected def withNewChildInternal(
      newChild: Expression): HtmlTextScan = copy(child = newChild)
}
