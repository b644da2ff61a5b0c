package graft.extract

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import scala.util.matching.Regex

/** Deterministic HTML → text extraction — THE per-row invariant.
  *
  * BASELINE.json `input_hint`: "byte-identical extracted text per url".
  * This object is the generalized analog of the reference's deterministic
  * clang AST extractor (reference: compilation_parser.py:49-121): a pure
  * function applied inside a typed `Dataset.map`, never `asNondeterministic`.
  *
  * FROZEN POLICY v1 (SURVEY.md §7.4 "byte-identical extraction") — do NOT
  * change any step without bumping VERSION and re-cutting golden hashes:
  *   1. Decode bytes as UTF-8; malformed sequences become U+FFFD
  *      (java.lang.String's standard replacement decode).
  *   2. Strip HTML comments `<!-- ... -->` (non-greedy, dotall).
  *   3. Strip <script>...</script> and <style>...</style> incl. their
  *      content (case-insensitive, non-greedy, dotall).
  *   4. Replace block-level tags (p div br h1-h6 li ul ol tr td th table
  *      title head body html section article header footer blockquote pre,
  *      opening or closing, any attributes) with "\n"; all other tags
  *      with "" (inline).
  *   5. Decode entities: &amp; &lt; &gt; &quot; &apos; &nbsp; and numeric
  *      &#NNN; / &#xHH; (code points rendered via Character.toChars).
  *      &nbsp; decodes to a PLAIN SPACE (0x20), not U+00A0.
  *   6. Whitespace normalization: every run of [ \t\f\u000B\r]+ → one
  *      space; split on '\n'; trim each line; drop empty lines; join
  *      remaining lines with a single '\n'. No trailing newline.
  */
object HtmlText {
  val VERSION = "extractor-v1"

  private val comment: Regex = "(?s)<!--.*?-->".r
  private val scriptStyle: Regex = "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>".r

  private val BlockNames: Set[String] = {
    val names = Seq("p", "div", "br", "li", "ul", "ol", "tr", "td", "th",
      "table", "title", "head", "body", "html", "section", "article",
      "header", "footer", "blockquote", "pre") ++ (1 to 6).map(i => s"h$i")
    names.toSet
  }

  /** Step 1 alone, exposed for reuse: UTF-8 replacement decode. */
  def decodeUtf8(bytes: Array[Byte]): String =
    new String(bytes, StandardCharsets.UTF_8)

  def extract(html: Array[Byte]): String = extractFromString(decodeUtf8(html))

  /** Perf note: steps 4-6 of the frozen v1 policy are implemented as
    * fused single-pass scanners (tag pass, entity pass, whitespace pass)
    * -- output byte-identical to the original regex cascade; equivalence
    * is property-tested against the retained reference implementation
    * (HtmlTextReferenceSpec) and the golden sha256 fixtures. Steps 2-3
    * (comment / script-style excision) stay as regexes: their
    * interleaving corner cases are not worth hand-replicating. */
  def extractFromString(raw: String): String = {
    var s = raw
    s = comment.replaceAllIn(s, "")
    s = scriptStyle.replaceAllIn(s, "")
    s = stripBlockTags(s) // == blockTag.replaceAllIn(s, "\n")
    s = stripAnyTags(s) // == anyTag.replaceAllIn(s, "")
    s = decodeNamedEntities(s) // == the six sequential .replace passes
    s = decodeNumericEntities(s) // == the numEntity regex pass (runs AFTER
    // the named pass -- so "&amp;#65;" decodes to "A", as in v1)
    normalizeWs(s)
  }

  private def isWordChar(ch: Char): Boolean =
    (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') ||
      (ch >= '0' && ch <= '9') || ch == '_'

  /** Scan equivalent to the blockTag regex (optional '/', block name,
    * word boundary, anything-but-'>' run, '>'), emitting "\n". A
    * non-matching '<' advances ONE char (regex does not consume non-matches; a block
    * tag nested inside a malformed tag must still be found). A tag is a
    * block match iff its maximal word-run name is in BlockNames (equivalent
    * to alternative-plus-word-boundary) and a '>' exists. */
  private def stripBlockTags(s: String): String = {
    val n = s.length
    if (s.indexOf('<') < 0) return s
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '<') { out.append(c); i += 1 }
      else {
        var j = i + 1
        if (j < n && s.charAt(j) == '/') j += 1
        var k = j
        while (k < n && isWordChar(s.charAt(k))) k += 1
        val gt = if (k < n) s.indexOf('>', k) else -1
        if (k > j && gt >= 0 &&
          BlockNames.contains(s.substring(j, k).toLowerCase(java.util.Locale.ROOT))) {
          out.append('\n'); i = gt + 1
        } else { out.append(c); i += 1 }
      }
    }
    out.toString
  }

  /** Scan equivalent to the anyTag regex: consume '<' to the FIRST '>'; a '<'
    * with no later '>' stays literal (regex finds no match). */
  private def stripAnyTags(s: String): String = {
    val n = s.length
    if (s.indexOf('<') < 0) return s
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '<') { out.append(c); i += 1 }
      else {
        val gt = s.indexOf('>', i + 1)
        if (gt < 0) { out.append(c); i += 1 }
        else i = gt + 1
      }
    }
    out.toString
  }

  /** One scan replacing the six sequential .replace passes. Left-to-
    * right single-pass is equivalent: no decoded output creates a new
    * NAMED entity match (the &amp; replacement is '&' and the scan
    * continues after it -- exactly the sequenced-String.replace result
    * with &amp; ordered last). */
  private def decodeNamedEntities(s: String): String = {
    val n = s.length
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else if (s.regionMatches(i + 1, "lt;", 0, 3)) { out.append('<'); i += 4 }
      else if (s.regionMatches(i + 1, "gt;", 0, 3)) { out.append('>'); i += 4 }
      else if (s.regionMatches(i + 1, "quot;", 0, 5)) { out.append('"'); i += 6 }
      else if (s.regionMatches(i + 1, "apos;", 0, 5)) { out.append('\''); i += 6 }
      else if (s.regionMatches(i + 1, "nbsp;", 0, 5)) { out.append(' '); i += 6 }
      else if (s.regionMatches(i + 1, "amp;", 0, 4)) { out.append('&'); i += 5 }
      else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** One scan == the `&#(x[0-9a-fA-F]+|[0-9]+);` regex pass (lowercase
    * 'x' only, as in v1). Invalid code points -> U+FFFD. Digit strings
    * overflowing Int yield U+FFFD (v1 threw NumberFormatException --
    * the one deliberate divergence: decode must not crash on garbage). */
  private def decodeNumericEntities(s: String): String = {
    val n = s.length
    if (s.indexOf("&#") < 0) return s
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&' || i + 1 >= n || s.charAt(i + 1) != '#') { out.append(c); i += 1 }
      else {
        var j = i + 2
        val hexMode = j < n && s.charAt(j) == 'x'
        val digitsStart = if (hexMode) j + 1 else j
        var k = digitsStart
        def isDig(ch: Char) = if (hexMode)
          (ch >= '0' && ch <= '9') || (ch >= 'a' && ch <= 'f') || (ch >= 'A' && ch <= 'F')
        else ch >= '0' && ch <= '9'
        while (k < n && isDig(s.charAt(k))) k += 1
        if (k > digitsStart && k < n && s.charAt(k) == ';') {
          val numStr = s.substring(digitsStart, k)
          val cp = try {
            if (hexMode) Integer.parseInt(numStr, 16) else Integer.parseInt(numStr, 10)
          } catch { case _: NumberFormatException => -1 }
          if (cp >= 0 && Character.isValidCodePoint(cp)) out.appendCodePoint(cp)
          else out.append('\uFFFD')
          i = k + 1
        } else { out.append(c); i += 1 }
      }
    }
    out.toString
  }

  /** One scan replacing hspace-regex + split + trim + filter + join.
    * Policy: runs of [ \t\f\r] -> one space; lines trimmed with
    * String.trim semantics (strip chars <= 0x20 at both ends); empty
    * lines dropped; '\n' joins; no trailing newline. */
  private def normalizeWs(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    val line = new java.lang.StringBuilder(80)
    def isH(ch: Char) = ch == ' ' || ch == '\t' || ch == '\f' || ch == '\u000B' || ch == '\r'
    def flush(): Unit = {
      // String.trim: drop leading/trailing chars <= ' '
      var a = 0
      var b = line.length
      while (a < b && line.charAt(a) <= ' ') a += 1
      while (b > a && line.charAt(b - 1) <= ' ') b -= 1
      if (b > a) {
        if (out.length > 0) out.append('\n')
        out.append(line, a, b)
      }
      line.setLength(0)
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\n') { flush(); i += 1 }
      else if (isH(c)) {
        line.append(' ')
        i += 1
        while (i < n && isH(s.charAt(i))) i += 1
      } else { line.append(c); i += 1 }
    }
    flush()
    out.toString
  }

  /** Outgoing links: ordered, de-duplicated href="..." / href='...' values.
    * (≙ include-edge extraction, reference: compilation_parser.py:106-111) */
  private val hrefRe: Regex = "(?i)<a\\b[^>]*\\bhref\\s*=\\s*(\"([^\"]*)\"|'([^']*)')".r
  def extractLinks(html: Array[Byte]): Seq[String] = {
    val s = decodeUtf8(html)
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    hrefRe.findAllMatchIn(s).foreach { m =>
      val v = if (m.group(2) != null) m.group(2) else m.group(3)
      if (v != null && v.nonEmpty) seen += v
    }
    seen.toSeq
  }

  /** Lowercase-hex SHA-256 of the extracted text's UTF-8 bytes —
    * the hash the invariant tests compare (FIXTURES.md §2.4 text_hashes). */
  def sha256Hex(text: String): String = {
    val d = MessageDigest.getInstance("SHA-256")
      .digest(text.getBytes(StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString
  }
}
