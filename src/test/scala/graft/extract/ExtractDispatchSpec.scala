package graft.extract

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.PageRow

/** P5 adaptive dispatch: the strategy pick must be a pure function of the
  * DATA, not of partition layout — the sample is the `sampleSize` rows
  * with the smallest xxhash64(url), identical under any repartitioning.
  */
class ExtractDispatchSpec extends SparkSpec {
  import spark.implicits._

  private def page(i: Int, html: String) = PageRow(
    url = s"https://s.example/p/$i",
    warc_ts = new Timestamp(1577836800000L + i * 1000L),
    html = html.getBytes("UTF-8"), text = null, lang = "en")

  test("inferExtractor pick is invariant under repartition") {
    // 300 rows, just over half html → the pick depends on WHICH rows the
    // sample sees; a layout-dependent sample could flip it
    val rows = (0 until 300).map { i =>
      if (i % 2 == 0 || i % 7 == 0) page(i, s"<html><body>p $i</body></html>")
      else page(i, s"plain text $i")
    }
    val ds = spark.createDataset(rows)
    val picks = Seq(ds, ds.repartition(13), ds.repartition(1),
      ds.repartition(64)).map(Extract.inferExtractor(_, sampleSize = 64))
    picks.distinct.size shouldBe 1
  }

  test("inferExtractor: majority-html corpus → tag-aware, plain → fallback") {
    val htmlDs = spark.createDataset(
      (0 until 20).map(i => page(i, s"<html><body>x $i</body></html>")))
    Extract.inferExtractor(htmlDs) shouldBe HtmlTextExtractor
    val plainDs = spark.createDataset(
      (0 until 20).map(i => page(i, s"just words $i")))
    Extract.inferExtractor(plainDs) shouldBe PlainTextExtractor
    // runAuto on plain text keeps the raw words (no tag stripping applied)
    val ex = Extract.runAuto(plainDs).collect().map(e => e.url -> e.text).toMap
    ex.values.foreach(_ should include("just words"))
  }
}
