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

  test("bottom-up roll-up covers the FULL path hierarchy at every depth") {
    val ps = Enrich.pageSummaries(extracted)
    val (leaves, internal) = Enrich.urlHierarchy(ps)
    val rolled = Enrich.hierarchyRollup(leaves, internal).cache()
    // one summary per internal node — root, hosts, and EVERY deeper
    // path-prefix section (the synth corpus has sections at depth 2-4)
    rolled.count() shouldBe internal.count()
    val byDepth = rolled.groupBy("depth").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    byDepth(0) shouldBe 1L // the PROJECT root
    byDepth(1) shouldBe cfg.nSites.toLong
    byDepth(2) shouldBe cfg.nSites.toLong // one '/p' section per site
    byDepth.keySet.max should be >= 3 // deeper sections really exist
    // exact child counts are embedded deterministically: the root rolls
    // up exactly the sites
    rolled.filter(col("depth") === 0).head().getString(2) should
      include(s" [${cfg.nSites} children]")
  }

  test("roll-up sample is bounded and deterministic: cap smallest + exact count") {
    import spark.implicits._
    // a head parent with far more children than the cap: the summarizer
    // must see ONLY the RollupCap lexicographically-smallest summaries,
    // while the suffix carries the exact total — and the result must be
    // identical under different parallelism (two-phase salted agg)
    val echo = new Enrich.Summarizer { def summarize(c: String): String = c }
    val leaves = (1 to 200).map(i => (f"https://h.example/p/$i", "h.example/p", f"s$i%03d"))
      .toDF("node", "parent", "summary")
    val internal = Seq(("h.example/p", null.asInstanceOf[String], 0))
      .toDF("node", "parent", "depth")
    val expected = (1 to Enrich.RollupCap).map(i => f"s$i%03d").mkString("|") +
      " [200 children]"
    Enrich.hierarchyRollup(leaves, internal, echo)
      .head().getString(2) shouldBe expected
    Enrich.hierarchyRollup(leaves.repartition(17), internal, echo)
      .head().getString(2) shouldBe expected
  }

  test("context collect is capped at the smallest ContextCap summaries") {
    import spark.implicits._
    // one hub url with 300 distinct-summary neighbors
    val edges = (1 to 300).map(i => ("hub", s"n$i")).toDF("subj", "obj")
    val sums = (("hub", "hubsum") +: (1 to 300).map(i => (s"n$i", f"x$i%03d")))
      .toDF("url", "summary")
    val r = Enrich.contextSummaries(edges, sums, cap = 10)
      .filter(col("url") === "hub").head().getSeq[String](2)
    r shouldBe (1 to 10).map(i => f"x$i%03d")
  }

  test("nodeEnrichment: one enriched row per page/site/section + the PROJECT root") {
    import spark.implicits._
    val ex = Extract.run(Synth.pages(spark, cfg))
    val nPages = ex.count()
    val nSites = ex.select("site").distinct().count()
    val internal = graft.emit.Hierarchy
      .internalNodes(ex.toDF().select(col("url"))).cache()
    val linksTo = ex.toDF().select(col("url").as("subj"),
      explode(col("links")).as("obj"))
      .join(ex.toDF().select(col("url").as("obj")), Seq("obj"), "left_semi")
    val enriched = Enrich.nodeEnrichment(ex, linksTo).cache()
    enriched.count() shouldBe nPages + internal.count()
    // fake summarizer constant on pages; roll-up marker on internal nodes
    enriched.filter(col("label") === "PAGE")
      .filter(col("summary") =!= Enrich.FakeSummary).count() shouldBe 0L
    enriched.filter(col("label") === "SITE").count() shouldBe nSites
    enriched.filter(col("label") === "SECTION").count() shouldBe
      internal.filter(col("depth") >= 2).count()
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
