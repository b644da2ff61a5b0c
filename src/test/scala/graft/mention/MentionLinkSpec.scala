package graft.mention

import graft.SparkSpec
import graft.link.Link
import graft.model.{AliasRow, ExtractedPage, PageRow}
import graft.util.SaltedJoin
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class MentionLinkSpec extends SparkSpec {
  import spark.implicits._

  private def page(url: String, text: String) =
    ExtractedPage(url, "s", new Timestamp(0L), text, "en", Nil, "")

  test("tokenizer: lowercase, alnum runs, empties dropped") {
    Mention.tokenize("Acme, Corp!  x9 --") shouldBe Array("acme", "corp", "x9")
    Mention.tokenize("") shouldBe Array()
  }

  test("n-gram matches 1- and 2-token aliases, overlaps allowed") {
    val pages = spark.createDataset(Seq(page("u1", "Visit Acme Corp today acme")))
    val dict = spark.createDataset(Seq(
      AliasRow("acme", 1L, 0.9), AliasRow("acme corp", 2L, 0.8)))
    val got = Mention.detect(pages, dict).collect()
      .map(c => (c.tok_start, c.tok_len, c.alias, c.entity_id)).toSet
    got shouldBe Set((1, 1, "acme", 1L), (1, 2, "acme corp", 2L), (4, 1, "acme", 1L))
  }

  test("ambiguous alias resolves by score, ties by lowest entity id") {
    val pages = spark.createDataset(Seq(page("u1", "zorg zorg")))
    val dict = spark.createDataset(Seq(
      AliasRow("zorg", 5L, 0.7), AliasRow("zorg", 9L, 0.7)))
    val cands = Mention.detect(pages, dict)
    val linked = Link.resolve(cands, nPages = 10L).collect()
    linked.length shouldBe 2
    // equal prior, equal support → tie broken by LOWEST entity id
    linked.map(_.entity_id).toSet shouldBe Set(5L)
  }

  test("higher prior wins; page support can flip a close race") {
    val pages = spark.createDataset(Seq(
      page("u1", "pied piper pied piper pied piper stark")))
    val dict = spark.createDataset(Seq(
      AliasRow("pied piper", 1L, 0.9),
      AliasRow("stark", 2L, 0.9), AliasRow("stark", 3L, 0.89)))
    val linked = Link.resolve(Mention.detect(pages, dict), 10L)
      .collect().map(l => (l.alias, l.entity_id)).toSet
    linked should contain(("stark", 2L))
    linked.collect { case ("pied piper", e) => e }.toSet shouldBe Set(1L)
  }

  test("over-cap alias dictionary fails with the named broadcast-contract error") {
    val pages = spark.createDataset(Seq(page("u1", "alias2 text")))
    val dict = spark.createDataset(
      (0L until 5L).map(i => AliasRow(s"alias$i", i, 0.5)))
    val e = intercept[IllegalStateException] {
      Mention.detect(pages, dict, maxDictRows = 3).count()
    }
    e.getMessage should include("MaxDictRows")
    e.getMessage should include("BROADCAST")
    // at (or under) the cap the same dictionary works
    Mention.detect(pages, dict, maxDictRows = 5).count() shouldBe 1L
  }

  test("empty alias dictionary yields empty candidates, not an NPE") {
    val pages = spark.createDataset(Seq(page("u1", "some text here")))
    val dict = spark.emptyDataset[AliasRow]
    Mention.detect(pages, dict).count() shouldBe 0L
  }

  test("salted inner join equals plain inner join") {
    val big = (0L until 2000L)
      .map(i => (i % 5, s"u$i")).toDF("k", "url") // key 0..4, skewed fine
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"))
      .toDF("k", "v")
    val salted = SaltedJoin.inner(big, dim, "k", col("url"), salt = 8)
      .select("k", "url", "v").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val plain = big.join(dim, "k")
      .select("k", "url", "v").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    salted shouldBe plain
    salted.size shouldBe 2000
  }

  test("salted count equals plain count per key") {
    val df = (0L until 999L).map(i => (if (i % 3 == 0L) "hot" else s"k${i % 7}", s"u$i"))
      .toDF("alias", "url")
    val salted = SaltedJoin.saltedCount(df, "alias", col("url"), salt = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val plain = df.groupBy("alias").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    salted shouldBe plain
  }
}
