package graft.extract

/** Pluggable extraction strategy — the generalized analog of the
  * reference's clang-vs-tree-sitter parser strategies
  * (compilation_parser.py:192-235, factory compilation_manager.py:
  * 113-123; SURVEY.md §2.9): a deterministic Scala trait used inside a
  * typed Dataset.map, never a SQL UDF. Each implementation carries its
  * own frozen version string — stage checkpoints key on it, so swapping
  * strategies invalidates exactly the extract stage.
  */
trait TextExtractor extends Serializable {
  def version: String
  def extractText(html: Array[Byte]): String
  def extractLinks(html: Array[Byte]): Seq[String]
}

/** Full HTML-aware extraction (the default; golden-hashed). */
object HtmlTextExtractor extends TextExtractor {
  override def version: String = HtmlText.VERSION
  override def extractText(html: Array[Byte]): String = HtmlText.extract(html)
  override def extractLinks(html: Array[Byte]): Seq[String] =
    HtmlText.extractLinks(html)
}

/** Syntactic fallback (≙ tree-sitter strategy S7): no tag semantics,
  * just UTF-8 decode + the same whitespace policy; finds no links. */
object PlainTextExtractor extends TextExtractor {
  override def version: String = "plain-v1"
  override def extractText(html: Array[Byte]): String = {
    val s = HtmlText.decodeUtf8(html)
    s.replaceAll("[ \\t\\f\\u000B\\r]+", " ")
      .split('\n').iterator.map(_.trim).filter(_.nonEmpty).mkString("\n")
  }
  override def extractLinks(html: Array[Byte]): Seq[String] = Nil
}
