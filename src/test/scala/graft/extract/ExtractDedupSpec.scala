package graft.extract

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.PageRow
import graft.synth.{Synth, SynthConfig}

/** The round-5 key-width dedup (narrow-key winner pass + broadcast
  * probe) must be ROW-IDENTICAL to the wide-shuffle plan it replaced on
  * every corpus shape: normal dup mix, same-warc_ts hash ties,
  * byte-identical duplicate captures (winner-key ties → legacy branch),
  * and across partitionings.
  */
class ExtractDedupSpec extends SparkSpec {
  import spark.implicits._

  private def collectSorted(ds: org.apache.spark.sql.Dataset[graft.model.ExtractedPage]) =
    ds.collect().sortBy(_.url).map(e =>
      (e.url, e.site, e.warc_ts, e.text_sha256, e.html_xxh64, e.links)).toSeq

  test("agreement with the wide-shuffle plan on the synthetic dup mix") {
    val cfg = SynthConfig(nPages = 300L) // ~2% of pages carry a later dup
    val pages = Synth.pages(spark, cfg)
    val fast = collectSorted(Extract.run(pages))
    val wide = collectSorted(Extract.runWideShuffle(pages))
    fast.size shouldBe 300
    fast shouldBe wide
  }

  private def page(url: String, sec: Long, html: String): PageRow =
    PageRow(url, new Timestamp(sec * 1000L),
      html.getBytes("UTF-8"), null, "en")

  test("same-warc_ts hash tie and byte-identical captures: one deterministic row per url") {
    val rows = Seq(
      // same ts, different html → hash breaks the tie (frozen key)
      page("https://a/x", 100L, "<html><body>alpha</body></html>"),
      page("https://a/x", 100L, "<html><body>beta</body></html>"),
      // byte-identical duplicate captures (winner-key tie → legacy branch)
      page("https://a/y", 100L, "<html><body>same</body></html>"),
      page("https://a/y", 100L, "<html><body>same</body></html>"),
      page("https://a/y", 100L, "<html><body>same</body></html>"),
      // later capture wins regardless of hash
      page("https://a/z", 100L, "<html><body>old</body></html>"),
      page("https://a/z", 200L, "<html><body>new</body></html>"),
      // uncontested
      page("https://a/w", 100L, "<html><body>solo</body></html>"))
    val pages = spark.createDataset(rows)
    val got = Extract.run(pages).collect().map(e => e.url -> e.text).toMap
    got.keySet shouldBe Set("https://a/x", "https://a/y", "https://a/z", "https://a/w")
    got("https://a/y") shouldBe "same"
    got("https://a/z") shouldBe "new"
    got("https://a/w") shouldBe "solo"
    // the hash-tie pick equals the wide plan's (ONE frozen key everywhere)
    val wide = Extract.runWideShuffle(pages).collect().map(e => e.url -> e.text).toMap
    got("https://a/x") shouldBe wide("https://a/x")

    // parallelism-invariant: identical rows at 1 and 7 partitions
    val a = collect(Extract.run(pages.repartition(1)))
    val b = collect(Extract.run(pages.repartition(7)))
    a shouldBe b
  }

  private def collect(ds: org.apache.spark.sql.Dataset[graft.model.ExtractedPage]) =
    ds.collect().sortBy(_.url).map(e => (e.url, e.text_sha256, e.warc_ts)).toSeq

  test("pass 1 prunes the html column out of the parquet scan") {
    // the scale property of the key-width plan: the winner pass reads
    // ~1% of the input bytes. Must survive the toDF().select path from
    // a TYPED parquet Dataset (an intervening typed map would break it).
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-prune").toString
    val rows = Seq(
      page("https://p/1", 100L, "<html><body>one</body></html>"),
      page("https://p/1", 200L, "<html><body>two</body></html>"),
      page("https://p/2", 100L, "<html><body>three</body></html>"))
    spark.createDataset(rows).write.mode("overwrite").parquet(dir)
    val pages = spark.read.parquet(dir).as[PageRow]
    val p1 = Extract.contestedUrls(pages)
    val plan = p1.queryExecution.executedPlan.toString
    plan should include("ReadSchema: struct<url:string,warc_ts:timestamp>")
    (plan should not).include("html")
    p1.collect().map(_.getString(0)).toSeq shouldBe Seq("https://p/1")
  }

  test("empty input and all-duplicates input") {
    Extract.run(spark.emptyDataset[PageRow]).count() shouldBe 0L
    val dup = spark.createDataset(Seq(
      page("https://d/1", 100L, "<html><body>v1</body></html>"),
      page("https://d/1", 150L, "<html><body>v2</body></html>"),
      page("https://d/1", 120L, "<html><body>v3</body></html>")))
    val got = Extract.run(dup).collect()
    got.length shouldBe 1
    got.head.text shouldBe "v2"
  }
}
