package graft.enrich

import graft.emit.Hierarchy
import graft.model.{ExtractedPage, Label}
import graft.util.Det
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Deterministic enrichment stage — the generalized shape of the
  * reference's RAG pass 7 (code_graph_rag_generator.py:67-76) with its
  * FAKE clients: summaries use the reference's own constant string
  * (llm_client.py:97-99 — "the fake client is the reference's
  * determinism switch", SURVEY.md §2.9), embeddings use a seeded
  * hash→vector stand-in for all-MiniLM-L6-v2 (384-dim, llm_client.py:138).
  *
  * What is preserved is the DATAFLOW: per-leaf summary → neighbor
  * context join (J9) → bottom-up hierarchical roll-up by depth
  * (A11/A12, code_graph_rag_generator.py:350-445) → embedding column.
  * Swap the traits for real clients in production; the plan shapes and
  * tests stay valid.
  */
object Enrich {

  /** The reference's fake-LLM constant (llm_client.py:97-99). */
  val FakeSummary = "This part implements important functionalities."

  trait Summarizer extends Serializable {
    def summarize(context: String): String
  }
  object FakeSummarizer extends Summarizer {
    override def summarize(context: String): String = FakeSummary
  }

  trait Embedder extends Serializable {
    def dim: Int
    def embed(text: String): Array[Float]
  }
  /** Seeded, unit-normalized pseudo-embedding (deterministic). */
  final class FakeEmbedder(val dim: Int = 384, seed: Long = 42L) extends Embedder {
    override def embed(text: String): Array[Float] = {
      val base = Det.h(seed, Det.hashStr(text))
      val raw = Array.tabulate(dim)(i => Det.unit(Det.h(base, i.toLong)) * 2.0 - 1.0)
      val norm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(x => (x / norm).toFloat)
    }
  }

  /** Leaf summaries + embeddings per page (pass 7 sub-pass 1 analog). */
  def pageSummaries(
      extracted: Dataset[ExtractedPage],
      summarizer: Summarizer = FakeSummarizer,
      embedder: Embedder = new FakeEmbedder()): DataFrame = {
    val spark = extracted.sparkSession
    import spark.implicits._
    extracted.map { p =>
      val s = summarizer.summarize(p.text)
      (p.url, p.site, s, embedder.embed(s))
    }.toDF("url", "site", "summary", "summaryEmbedding")
  }

  /** Neighbor-context join (J9 analog: OPTIONAL MATCH both directions +
    * collect DISTINCT, code_graph_rag_generator.py:281-289): for each
    * page in `pageSums`, the sorted distinct summaries of link-neighbors
    * in either direction. array_sort makes the output order-insensitive.
    *
    * @param neighborSums where neighbor summaries are looked up; defaults
    *        to `pageSums`. The incremental updater passes the FULL corpus
    *        summary table here while `pageSums` holds only the dirty
    *        scope — context is correct even when a neighbor lives in a
    *        clean bucket. */
  /** Aggregation-buffer bound for the context collect and the roll-up
    * child sample: a real-web head node (10⁷-page site, 10⁵-in-degree
    * hub) must not materialize all children in ONE buffer. The capped
    * set is the lexicographically SMALLEST `cap` values — deterministic,
    * and computed by the bounded top-K aggregate
    * [[graft.functions.TopKSorted]], whose buffer evicts the largest
    * element on insert: no partial, merge, or spilled buffer ever holds
    * more than `cap` elements regardless of group size (the bound is
    * structural, not a post-aggregation slice). */
  val ContextCap = 128

  /** Smallest-`cap` sorted distinct `valueCol` per `key`, with a
    * structurally bounded aggregation buffer (TopKSorted — spec'd against
    * the slice(array_sort(collect_set)) shape and peak-asserted). */
  private def cappedSortedSet(
      df: DataFrame, key: String, valueCol: String,
      cap: Int, outName: String): DataFrame =
    df.groupBy(col(key))
      .agg(graft.functions.TopKSorted
        .topk_sorted(col(valueCol), cap, distinct = true).as(outName))

  def contextSummaries(
      linksTo: DataFrame,
      pageSums: DataFrame,
      neighborSums: Option[DataFrame] = None,
      cap: Int = ContextCap): DataFrame = {
    val lookup = neighborSums.getOrElse(pageSums)
    val out = linksTo.select(col("subj").as("url"), col("obj").as("nbr"))
    val in = linksTo.select(col("obj").as("url"), col("subj").as("nbr"))
    val joined = out.union(in)
      .join(lookup.select(col("url").as("nbr"), col("summary")), Seq("nbr"))
    val nbrs = cappedSortedSet(joined, "url", "summary",
      cap, "neighborSummaries")
    pageSums.select(col("url"), col("summary"))
      .join(nbrs, Seq("url"), "left")
      .select(col("url"), col("summary"),
        coalesce(col("neighborSummaries"),
          array().cast("array<string>")).as("neighborSummaries"))
  }

  /** FROZEN roll-up policy: an internal node's summary is a function of
    * a deterministic SAMPLE of its children — the RollupCap
    * lexicographically-smallest child summaries — plus the EXACT child
    * count (the " [N children]" suffix). The reference feeds the
    * summarizer every child (code_graph_rag_generator.py:408-423); at
    * 10⁷-page head sites that is a multi-GB list in one aggregation
    * buffer, so the sample is this engine's scale policy. With the fake
    * summarizer the output is identical either way (it is a constant
    * plus the exact count). */
  val RollupCap = 64

  /** Bottom-up hierarchical roll-up (A11+A12 analog): nodes are url-path
    * prefixes (site / site/p / ... / page); each level's summary is a
    * deterministic function of a capped sorted sample of its children's
    * summaries + the exact child count, processed deepest-first in a
    * driver loop over depth — the Spark shape of the reference's
    * group-by-depth folder pass (code_graph_rag_generator.py:392-423).
    * Each level's sample aggregates with the bounded top-K buffer
    * (TopKSorted): no buffer holds more than RollupCap summaries
    * regardless of a node's child count — structurally, in the partial,
    * merge, AND spill paths. Returns (node, depth, summary). */
  def hierarchyRollup(
      leaves: DataFrame, // (node, parent, summary); parent = an internal node
      internal: DataFrame, // (node, parent, depth) internal nodes; root parent = null
      summarizer: Summarizer = FakeSummarizer,
      cap: Int = RollupCap): DataFrame = {
    val s = summarizer
    val sumUdf = udf((sample: Seq[String], total: Long) =>
      s.summarize(sample.mkString("|")) + s" [$total children]")
    // one materialization of the internal-node frame: it is consumed
    // maxDepth+2 times below (max probe, leaf routing, one filter per
    // level) and its usual derivation (internalNodes: posexplode +
    // distinct) would otherwise re-shuffle on every consumption
    val internalCk = internal
      .select(col("node"), col("parent"), col("depth")).localCheckpoint()
    // coalesce: no internal nodes → maxDepth -1 → empty loop, empty
    // result with the right schema (not an NPE on a null max)
    val maxDepth = internalCk
      .agg(coalesce(max(col("depth")), lit(-1))).head().getInt(0)
    // Route every leaf to the ONE level where it aggregates (its
    // parent's depth) with a single join, materialized once. The loop
    // then carries only each level's roll-up rows (one per internal
    // node of that level) — the previous shape unioned the FULL leaf
    // set into the accumulator and localCheckpointed it every level,
    // re-materializing n-leaf frames depth times (measured 6.7 s of a
    // 20k-page build for 101 internal nodes; this shape: ~1 s).
    val leavesByLevel = leaves
      .join(internalCk.select(col("node").as("parent"), col("depth").as("_pd")),
        Seq("parent"))
      .select(col("node"), col("parent"), col("summary"), col("_pd"))
      .localCheckpoint()
    val emptyCarry = leaves
      .select(col("node"), col("parent"), col("summary")).limit(0)
    var carry = emptyCarry
    var out: Seq[DataFrame] = Nil
    (maxDepth to 0 by -1).foreach { d =>
      val level = internalCk.filter(col("depth") === d)
        .select(col("node").as("lnode"), col("parent").as("lparent"))
      val input = leavesByLevel.filter(col("_pd") === d)
        .select(col("node"), col("parent"), col("summary"))
        .union(carry) // deeper level's roll-ups have parent depth d
      val rolled = input.join(level, input("parent") === level("lnode"))
        .groupBy(col("lnode"), col("lparent"))
        .agg(graft.functions.TopKSorted
          .topk_sorted(col("summary"), cap, distinct = false).as("sample"),
          count(lit(1)).as("total"))
        .select(col("lnode").as("node"), col("lparent").as("parent"),
          sumUdf(col("sample"), col("total")).as("summary"))
      // tiny: one row per level-d internal node; severs the per-level
      // lineage so depth chains stay O(1) plan-deep, and the final
      // union consumes the SAME materialization
      carry = rolled.localCheckpoint()
      out = out :+ carry.withColumn("depth", lit(d))
    }
    out.reduceOption(_ union _)
      .map(_.select(col("node"), col("depth"), col("summary")))
      .getOrElse(leaves.select(col("node"), lit(0).as("depth"),
        col("summary")).limit(0))
  }

  /** The enriched node-property table the staged build materializes —
    * ≙ the reference's summary + summaryEmbedding node properties on
    * FUNCTION/FILE/FOLDER/PROJECT (clangd_symbol_nodes_builder.py:55-103;
    * roll-up code_graph_rag_generator.py:350-445).
    *
    * One row per PAGE (leaf summary + embedding + sorted neighbor-context
    * summaries from the links_to graph), per SITE (bottom-up roll-up of
    * its pages' summaries), and the PROJECT root (roll-up of sites).
    * Schema: (node_id, label, summary, summaryEmbedding,
    * neighborSummaries).
    *
    * @param linksTo (subj, obj) page-link edges — pass the links_to
    *        triples. */
  def nodeEnrichment(
      extracted: Dataset[ExtractedPage],
      linksTo: DataFrame,
      summarizer: Summarizer = FakeSummarizer,
      embedder: Embedder = new FakeEmbedder()): DataFrame = {
    val pageSums = pageSummaries(extracted, summarizer, embedder)
    val pages = pageNodeRows(pageSums, linksTo)
    pages.union(
      internalNodeRows(pageLeaves(pageSums), summarizer, embedder))
  }

  /** (node, parent, summary) leaf rows for the roll-up: each page under
    * its deepest url-path prefix (arbitrary depth — the FOLDER chain). */
  def pageLeaves(pageSums: DataFrame): DataFrame =
    pageSums.select(col("url").as("node"),
      Hierarchy.parentOf(col("url")).as("parent"), col("summary"))

  /** PAGE rows of the enriched table: pageSums + neighbor context.
    * `neighborSums` as in contextSummaries. */
  def pageNodeRows(
      pageSums: DataFrame,
      linksTo: DataFrame,
      neighborSums: Option[DataFrame] = None): DataFrame = {
    val ctx = contextSummaries(
      linksTo.select(col("subj"), col("obj")),
      pageSums.select(col("url"), col("summary")), neighborSums)
    pageSums
      .join(ctx.select(col("url"), col("neighborSummaries")), Seq("url"))
      .select(col("url").as("node_id"), lit(Label.Page).as("label"),
        col("summary"), col("summaryEmbedding"), col("neighborSummaries"))
  }

  /** SITE + SECTION + PROJECT rows: bottom-up roll-up of page summaries
    * over the FULL url-path hierarchy (page → …sections… → site → root),
    * each level embedded — ≙ the reference's arbitrary-depth folder
    * roll-up (code_graph_rag_generator.py:392-423). Needs only
    * (node, parent, summary) leaves where node is the page URL — the
    * incremental updater feeds it the already-materialized page
    * summaries, so internal nodes refresh without re-summarizing any
    * page text. */
  def internalNodeRows(
      leaves: DataFrame, // (node = page url, parent, summary)
      summarizer: Summarizer = FakeSummarizer,
      embedder: Embedder = new FakeEmbedder()): DataFrame = {
    val spark = leaves.sparkSession
    import spark.implicits._
    val internal =
      Hierarchy.internalNodes(leaves.select(col("node").as("url")))
    val emb = embedder
    hierarchyRollup(leaves, internal, summarizer)
      .as[(String, Int, String)]
      .map { case (node, depth, summary) =>
        val label =
          if (depth == 0) Label.Project
          else if (depth == 1) Label.Site
          else Label.Section
        (node, label, summary, emb.embed(summary), Seq.empty[String])
      }
      .toDF("node_id", "label", "summary", "summaryEmbedding",
        "neighborSummaries")
  }

  /** Url-path hierarchy for the roll-up: leaf = page url under its
    * deepest path prefix; internal = every ancestor prefix, host at
    * depth 1, PROJECT root at depth 0 — ≙ ancestor-folder derivation A3
    * feeding the A11 depth loop, arbitrary depth. */
  def urlHierarchy(pageSums: DataFrame): (DataFrame, DataFrame) = {
    val leaves = pageLeaves(pageSums)
    val internal = Hierarchy.internalNodes(pageSums.select(col("url")))
    (leaves, internal)
  }
}
