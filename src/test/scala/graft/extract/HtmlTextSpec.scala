package graft.extract

import graft.SparkSpec
import graft.synth.{Synth, SynthConfig}

class HtmlTextSpec extends SparkSpec {

  private def x(s: String): String = HtmlText.extractFromString(s)

  test("strips comments, script and style including content") {
    x("<p>a</p><!-- hidden --><script>var x=1;</script><style>b{}</style><p>b</p>") shouldBe "a\nb"
  }

  test("block tags become newlines, inline tags vanish") {
    x("<div>one<br>two</div><span>three</span> <b>four</b>") shouldBe "one\ntwo\nthree four"
  }

  test("named and numeric entities decode; nbsp becomes plain space") {
    x("a&amp;b &lt;tag&gt; &quot;q&quot; &apos;s&apos; c&nbsp;d &#65; &#x42;") shouldBe
      "a&b <tag> \"q\" 's' c d A B"
  }

  test("whitespace policy: CR/tab runs collapse, lines trimmed, empties dropped") {
    x("  a\t\tb  \r\n\n\n   c   ") shouldBe "a b\nc"
  }

  test("malformed UTF-8 bytes become U+FFFD deterministically") {
    val bytes = Array[Byte]('a'.toByte, 0xC3.toByte, 0x28.toByte, 'b'.toByte)
    HtmlText.decodeUtf8(bytes) shouldBe "a�(b"
  }

  test("non-ASCII UTF-8 survives byte-exact") {
    val s = "<p>café 中文</p>"
    x(s) shouldBe "café 中文"
  }

  test("link extraction: ordered, deduped, both quote styles") {
    val h = """<a href="u1">x</a><a href='u2'>y</a><a href="u1">z</a>"""
      .getBytes("UTF-8")
    HtmlText.extractLinks(h) shouldBe Seq("u1", "u2")
  }

  test("extraction is idempotent on already-extracted text") {
    val t = x("<p>plain text line</p>")
    x(t) shouldBe t
  }

  // Golden per-url hash invariant (input_hint: "byte-identical extracted
  // text per url"). Hashes cut once from extractor-v1 on the seed-42
  // fixture corpus; any change to HtmlText MUST bump VERSION and re-cut.
  test("golden sha256 of extracted text for fixture pages 0..3") {
    val cfg = SynthConfig(nPages = 10)
    val got = (0L to 3L).map { i =>
      val p = Synth.pageRows(cfg, i).head
      HtmlText.sha256Hex(HtmlText.extract(p.html))
    }
    got shouldBe GoldenHashes.pages0to3
  }

  test("extractor version is frozen") {
    HtmlText.VERSION shouldBe "extractor-v1"
  }
}
