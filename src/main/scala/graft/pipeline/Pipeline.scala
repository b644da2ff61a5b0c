package graft.pipeline

import graft.canon.ConnectedComponents
import graft.emit.Emit
import graft.extract.{Extract, HtmlText}
import graft.link.Link
import graft.mention.Mention
import graft.meta.Snapshot
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** End-to-end KG construction (the Spark shape of the reference's
  * GraphBuilder.build, clangd_graph_rag_builder.py:48-76):
  *
  *   pages ─dedup+extract─► extracted ─detect─► candidates ─link─►
  *   linked ─⋈ canon(CC over sameas)─► triples / nodes / adjacency
  *
  * `run` is the in-memory dataflow (tests, bench); `build` adds the
  * per-stage snapshot/commit/resume protocol with bucketed Parquet
  * (explicit repartitioning by url-hash range, north_rule) + lineage.
  */
object Pipeline {

  final case class Graph(
      extracted: Dataset[ExtractedPage],
      linked: Dataset[LinkedMention],
      canon: Dataset[CanonRow],
      triples: Dataset[TripleRow],
      nodes: Dataset[NodeRow],
      adjacency: Dataset[AdjacencyRow]) {
    /** Release the intermediate caches `run` installed. */
    def unpersist(): Unit = {
      extracted.unpersist()
      linked.unpersist()
      canon.unpersist()
    }
  }

  /** In-memory dataflow. `extracted`, `linked` and `canon` are persisted
    * (MEMORY_AND_DISK): triples fans out into 4 branches and nodes /
    * adjacency re-consume them, so without a cache one action re-extracts
    * every page up to 4× (extraction dominates cost at any scale). Call
    * `Graph.unpersist()` when done. */
  def run(
      pages: Dataset[PageRow],
      aliases: Dataset[AliasRow],
      sameas: Dataset[SameAsEdge],
      nPages: Long): Graph = {
    val spark = pages.sparkSession
    import spark.implicits._

    val extracted = Extract.run(pages).persist(StorageLevel.MEMORY_AND_DISK)
    val cands = Mention.detect(extracted, aliases)
    val linked = Link.resolve(cands, nPages).persist(StorageLevel.MEMORY_AND_DISK)
    val entities = aliases.map(a => java.lang.Long.valueOf(a.entity_id)).distinct()
    val canon = ConnectedComponents.canonMap(entities, sameas)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val triples = Emit.triples(extracted, linked, canon)
    val nodesAll = Emit.nodes(extracted, triples)
    val nodes = Emit.dropOrphans(nodesAll, triples)
    Graph(extracted, linked, canon, triples, nodes, Emit.adjacency(triples))
  }

  /** Number of url-hash buckets for partitioned table layout. At cluster
    * scale this is sized so one bucket ≈ one comfortable task
    * (e.g. 2^14 buckets for 10^12 docs); locally small. */
  def bucketOf(c: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(c), lit(nBuckets.toLong))

  /** Staged build with checkpoints; every stage resumes from its last
    * committed snapshot (kill-and-resume safe — SURVEY.md §7.6). */
  def build(
      spark: SparkSession,
      pages: Dataset[PageRow],
      aliases: Dataset[AliasRow],
      sameas: Dataset[SameAsEdge],
      nPages: Long,
      outDir: String,
      snapshotId: String,
      nBuckets: Int = 32): Unit = {
    import spark.implicits._

    val extracted = Snapshot.stage(spark, outDir, "extracted", snapshotId,
      HtmlText.VERSION, Seq("bucket")) {
      Extract.run(pages).toDF()
        .withColumn("bucket", bucketOf(col("url"), nBuckets))
        .repartition(col("bucket"))
    }

    val linked = Snapshot.stage(spark, outDir, "linked", snapshotId, "link-v1",
      Seq("bucket")) {
      val ex = extracted.drop("bucket").as[ExtractedPage]
      val cands = Mention.detect(ex, aliases)
      Link.resolve(cands, nPages).toDF()
        .withColumn("bucket", bucketOf(col("url"), nBuckets))
        .repartition(col("bucket"))
    }

    val canon = Snapshot.stage(spark, outDir, "canon", snapshotId, "canon-v1") {
      val entities = aliases.map(a => java.lang.Long.valueOf(a.entity_id)).distinct()
      ConnectedComponents.canonMap(entities, sameas).toDF()
    }

    val triples = Snapshot.stage(spark, outDir, "triples", snapshotId,
      "emit-v1", Seq("bucket")) {
      val ex = extracted.drop("bucket").as[ExtractedPage]
      val lk = linked.drop("bucket").as[LinkedMention]
      Emit.triples(ex, lk, canon.as[CanonRow]).toDF()
        .withColumn("bucket", bucketOf(col("subj"), nBuckets))
        .repartition(col("bucket"))
    }

    Snapshot.stage(spark, outDir, "nodes", snapshotId, "emit-v1") {
      val ex = extracted.drop("bucket").as[ExtractedPage]
      val t = triples.drop("bucket").as[TripleRow]
      Emit.dropOrphans(Emit.nodes(ex, t, Some(snapshotId)), t).toDF()
    }

    Snapshot.stage(spark, outDir, "adjacency", snapshotId, "emit-v1",
      Seq("bucket")) {
      Emit.adjacency(triples.drop("bucket").as[TripleRow]).toDF()
        .withColumn("bucket", bucketOf(col("src"), nBuckets))
        .repartition(col("bucket"))
    }

    // enriched node properties (summary + embedding + neighbor context)
    // — ≙ the reference's RAG pass 7 writing summary/summaryEmbedding
    // onto FUNCTION/FILE/FOLDER/PROJECT nodes
    Snapshot.stage(spark, outDir, "enriched", snapshotId, "enrich-v1") {
      val ex = extracted.drop("bucket").as[ExtractedPage]
      val lt = triples.drop("bucket")
        .filter(col("pred") === Pred.LinksTo).select(col("subj"), col("obj"))
      graft.enrich.Enrich.nodeEnrichment(ex, lt)
    }
    ()
  }
}
