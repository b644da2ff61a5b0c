package graft.enrich

import graft.SparkSpec
import graft.extract.{Extract, PlainTextExtractor}
import graft.pipeline.Pipeline
import graft.synth.{Synth, SynthConfig}
import graft.util.UrlKit
import org.apache.spark.sql.functions._

class EnrichSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = SynthConfig(nPages = 60L, nSites = 3, nEntities = 20)
  private lazy val extracted = Extract.run(Synth.pages(spark, cfg)).cache()

  test("page summaries use the reference's fake constant; embeddings are 384-dim unit vectors") {
    val ps = Enrich.pageSummaries(extracted).cache()
    ps.select("summary").distinct().collect().map(_.getString(0)) shouldBe
      Array(Enrich.FakeSummary)
    val emb = ps.select("summaryEmbedding").head().getSeq[Float](0)
    emb.length shouldBe 384
    math.abs(emb.map(x => x.toDouble * x).sum - 1.0) should be < 1e-5
    // determinism: same text → same embedding
    val e2 = Enrich.pageSummaries(extracted).select("summaryEmbedding").head().getSeq[Float](0)
    e2 shouldBe emb
  }

  test("context join collects sorted distinct neighbor summaries both directions") {
    val g = Pipeline.run(Synth.pages(spark, cfg), Synth.aliases(spark, cfg),
      Synth.sameAs(spark, cfg), cfg.nPages)
    val links = g.triples.toDF().filter(col("pred") === "links_to")
    val ps = Enrich.pageSummaries(extracted)
    val ctx = Enrich.contextSummaries(links, ps)
    ctx.count() shouldBe extracted.count()
    // a page with at least one link neighbor carries its summary
    val withNbr = ctx.filter(
      org.apache.spark.sql.functions.size(col("neighborSummaries")) > 0)
    withNbr.count() should be > 0L
    withNbr.head().getSeq[String](2).head shouldBe Enrich.FakeSummary
  }

  test("bottom-up hierarchy roll-up: every site and the /p level get summaries") {
    val ps = Enrich.pageSummaries(extracted)
    val (leaves, internal) = Enrich.urlHierarchy(ps)
    val rolled = Enrich.hierarchyRollup(leaves, internal)
    val byDepth = rolled.groupBy("depth").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    byDepth(0) shouldBe cfg.nSites.toLong // one root summary per site
    byDepth(1) shouldBe cfg.nSites.toLong // one '/p' level per site
    // child counts are embedded deterministically
    rolled.filter(col("depth") === 1).head().getString(2) should include("children]")
  }

  test("nodeEnrichment: one enriched row per page/site + the PROJECT root") {
    import spark.implicits._
    val ex = Extract.run(Synth.pages(spark, cfg))
    val nPages = ex.count()
    val nSites = ex.select("site").distinct().count()
    val linksTo = ex.toDF().select(col("url").as("subj"),
      explode(col("links")).as("obj"))
      .join(ex.toDF().select(col("url").as("obj")), Seq("obj"), "left_semi")
    val enriched = Enrich.nodeEnrichment(ex, linksTo).cache()
    enriched.count() shouldBe nPages + nSites + 1
    // fake summarizer constant on pages; roll-up marker on internal nodes
    enriched.filter(col("label") === "PAGE")
      .filter(col("summary") =!= Enrich.FakeSummary).count() shouldBe 0L
    enriched.filter(col("label") === "SITE").count() shouldBe nSites
    val root = enriched.filter(col("label") === "PROJECT").collect()
    root.length shouldBe 1
    root.head.getAs[String]("node_id") shouldBe graft.emit.Emit.RootId
    root.head.getAs[String]("summary") should include("children]")
    // embeddings are 384-dim on every row
    enriched.select(org.apache.spark.sql.functions.size(col("summaryEmbedding")).as("d"))
      .distinct().collect().map(_.getInt(0)).toSet shouldBe Set(384)
    enriched.unpersist()
  }

  test("hierarchyRollup with no internal nodes → empty result, right schema, no NPE") {
    import spark.implicits._
    val leaves = Seq(("l1", "p", "s")).toDF("node", "parent", "summary")
    val internal = Seq.empty[(String, String, Int)].toDF("node", "parent", "depth")
    val r = Enrich.hierarchyRollup(leaves, internal)
    r.columns.toSeq shouldBe Seq("node", "depth", "summary")
    r.count() shouldBe 0L
  }

  test("pluggable extractor: plain strategy keeps tags, own version string") {
    val plain = Extract.run(Synth.pages(spark, cfg), PlainTextExtractor)
    val t = plain.head()
    t.text should include("<html>") // no tag stripping in the fallback
    PlainTextExtractor.version shouldBe "plain-v1"
  }

  test("data-inferred extractor dispatch: html corpus → tag-aware, plain → fallback") {
    import spark.implicits._
    Extract.inferExtractor(Synth.pages(spark, cfg)).version shouldBe
      graft.extract.HtmlText.VERSION
    val plain = Synth.pages(spark, cfg)
      .map(p => p.copy(html = "just words and no tags".getBytes("UTF-8")))
    Extract.inferExtractor(plain).version shouldBe "plain-v1"
    Extract.runAuto(plain).head().text shouldBe "just words and no tags"
  }

  test("UrlKit percent-decode policy") {
    UrlKit.percentDecode("a%20b%2Fc") shouldBe "a b/c"
    UrlKit.percentDecode("caf%C3%A9") shouldBe "café"
    UrlKit.percentDecode("100%") shouldBe "100%" // malformed: literal
    UrlKit.percentDecode("%GG") shouldBe "%GG"
    UrlKit.relativeTo("https://s.example/p/1", "https://s.example") shouldBe Some("p/1")
    UrlKit.relativeTo("https://other.example/p/1", "https://s.example") shouldBe None
  }
}
