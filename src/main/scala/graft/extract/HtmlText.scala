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
  private val blockTag: Regex =
    ("(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|title|head|body|html|" +
      "section|article|header|footer|blockquote|pre)\\b[^>]*/?>").r
  private val anyTag: Regex = "(?s)<[^>]*>".r
  private val numEntity: Regex = "&#(x[0-9a-fA-F]+|[0-9]+);".r
  private val hspace: Regex = "[ \\t\\f\\u000B\\r]+".r

  /** Step 1 alone, exposed for reuse: UTF-8 replacement decode. */
  def decodeUtf8(bytes: Array[Byte]): String =
    new String(bytes, StandardCharsets.UTF_8)

  def extract(html: Array[Byte]): String = extractFromString(decodeUtf8(html))

  def extractFromString(raw: String): String = {
    var s = raw
    s = comment.replaceAllIn(s, "")
    s = scriptStyle.replaceAllIn(s, "")
    s = blockTag.replaceAllIn(s, "\n")
    s = anyTag.replaceAllIn(s, "")
    s = decodeEntities(s)
    normalizeWs(s)
  }

  private def decodeEntities(s: String): String = {
    val named = s
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&nbsp;", " ").replace("&amp;", "&")
    numEntity.replaceAllIn(named, m => {
      val g = m.group(1)
      val cp = if (g.startsWith("x") || g.startsWith("X"))
        Integer.parseInt(g.substring(1), 16) else Integer.parseInt(g, 10)
      val out =
        if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp))
        else "\uFFFD"
      Regex.quoteReplacement(out)
    })
  }

  private def normalizeWs(s: String): String =
    hspace.replaceAllIn(s, " ")
      .split('\n')
      .iterator.map(_.trim).filter(_.nonEmpty)
      .mkString("\n")

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
