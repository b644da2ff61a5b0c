package graft.extract

import scala.util.matching.Regex

/** The ORIGINAL regex-cascade implementation of extractor-v1, retained
  * verbatim as the equivalence oracle for the fused-scanner rewrite in
  * HtmlText (same frozen policy, same VERSION). Any behavioral drift in
  * the scanners fails HtmlTextEquivalenceSpec.
  */
object HtmlTextReference {
  private val comment: Regex = "(?s)<!--.*?-->".r
  private val scriptStyle: Regex = "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>".r
  private val blockTag: Regex =
    ("(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|title|head|body|html|" +
      "section|article|header|footer|blockquote|pre)\\b[^>]*/?>").r
  private val anyTag: Regex = "(?s)<[^>]*>".r
  private val numEntity: Regex = "&#(x[0-9a-fA-F]+|[0-9]+);".r
  private val hspace: Regex = "[ \\t\\f\\u000B\\r]+".r

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
        else "�"
      Regex.quoteReplacement(out)
    })
  }

  private def normalizeWs(s: String): String =
    hspace.replaceAllIn(s, " ")
      .split('\n')
      .iterator.map(_.trim).filter(_.nonEmpty)
      .mkString("\n")
}
