package graft.util

import java.nio.charset.StandardCharsets

/** Deterministic URL helpers (≙ the reference's PathKit family: percent-
  * decode + relativize, clangd_symbol_nodes_builder.py:31-38 / SURVEY.md
  * §2.7). Frozen policy: valid %XX hex pairs decode to bytes, the byte
  * run is UTF-8-decoded with U+FFFD replacement; malformed sequences
  * ('%' not followed by two hex digits) pass through literally.
  */
object UrlKit {

  private def hex(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  def percentDecode(s: String): String = {
    val out = new StringBuilder(s.length)
    val bytes = new java.io.ByteArrayOutputStream()
    def flush(): Unit = if (bytes.size() > 0) {
      out ++= new String(bytes.toByteArray, StandardCharsets.UTF_8)
      bytes.reset()
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
        hex(s.charAt(i + 1)) >= 0 && hex(s.charAt(i + 2)) >= 0) {
        bytes.write(hex(s.charAt(i + 1)) * 16 + hex(s.charAt(i + 2)))
        i += 3
      } else {
        flush(); out += c; i += 1
      }
    }
    flush()
    out.toString
  }

  /** Path of `url` relative to `root` (both already decoded); urls not
    * under the root return None — the caller drops them, reproducing
    * the reference's drop-out-of-project semantics (Appendix B #1). */
  def relativeTo(url: String, root: String): Option[String] = {
    val r = if (root.endsWith("/")) root else root + "/"
    if (url.startsWith(r)) Some(url.substring(r.length)) else None
  }
}
