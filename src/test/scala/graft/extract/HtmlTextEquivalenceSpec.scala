package graft.extract

import graft.SparkSpec
import graft.synth.{Synth, SynthConfig}
import graft.util.Det

/** The fused-scanner HtmlText must be byte-identical to the original
  * regex cascade (HtmlTextReference) — the v1 invariant must survive
  * the performance rewrite. Corpus pages + handcrafted edge cases +
  * deterministic random HTML-ish garbage.
  */
class HtmlTextEquivalenceSpec extends SparkSpec {

  private def same(s: String) = withClue(s"input=<<<$s>>>: ") {
    HtmlText.extractFromString(s) shouldBe HtmlTextReference.extractFromString(s)
  }

  test("equivalent on the whole fixture corpus (rich + plain shapes)") {
    val cfgs = Seq(
      SynthConfig(nPages = 150L),
      SynthConfig(nPages = 60L, fillerParas = 5, mentionSlots = 12))
    cfgs.foreach { cfg =>
      Synth.pageRowsLocal(cfg).foreach { p =>
        same(new String(p.html, "UTF-8"))
      }
    }
  }

  test("equivalent on handcrafted edge cases") {
    Seq(
      "", "<", ">", "<>", "< >", "<p", "<p>", "</p>", "<//p>", "</ p>",
      "<press>no</press>", "<pre>x</pre>", "<h1x>", "<h7>", "<H3>UP</H3>",
      "<br/>", "<br />", "<p\"a>", "<a <p>", "<p <div>", "x<!-- <p> -->y",
      "<!-- unterminated", "<script>if(1<2){}</script>", "<script>leak",
      "<style>a{}</style>", "<ScRiPt x=1>z</sCrIpT >",
      "&amp;", "&amp;lt;", "&amp;#65;", "&lt;tag&gt;", "&nbsp;&nbsp;",
      "&#65;&#x42;&#x7a;", "&#X41;", "&#;", "&#x;", "&# 65;", "&unknown;",
      "&#1114111;", "&#1114112;", "&#0;", "a&b&c;", "&&amp;&",
      " \t\r\n x  y \f\n\n z  ", "\n\n\n", "a\r\nb", " <p> ",
      "tail<", "a<b", "<b>bold<i>it</i></b>", "<div>取引</div>",
      "%41 café 😀"
    ).foreach(same)
  }

  test("equivalent on 500 deterministic random HTML-ish strings") {
    val frags = Array(
      "<p>", "</p>", "<div class='x'>", "</div>", "<b>", "</b>", "<br/>",
      "<h2>", "</h2>", "<script>", "</script>", "<style>", "</style>",
      "<!--", "-->", "<", ">", "&amp;", "&lt;", "&gt;", "&nbsp;", "&#65;",
      "&#x4a;", "&#", ";", "&", "word", "two words", " ", "\t", "\n",
      "\r\n", "", "café", "<a href=\"u\">", "</a>", "<pre",
      "<p <div>", "<sp>", "x=1<2", "</", "<>")
    (0 until 500).foreach { trial =>
      val len = 3 + Det.nonNeg(Det.h(99L, trial.toLong, 0L), 30)
      val s = (0 until len).map { t =>
        frags(Det.nonNeg(Det.h(99L, trial.toLong, 1L + t), frags.length))
      }.mkString
      same(s)
    }
  }

  test("golden hashes unchanged (extractor-v1 stays extractor-v1)") {
    val cfg = SynthConfig(nPages = 10)
    val got = (0L to 3L).map { i =>
      val p = Synth.pageRows(cfg, i).head
      HtmlText.sha256Hex(HtmlText.extract(p.html))
    }
    got shouldBe GoldenHashes.pages0to3
  }
}
