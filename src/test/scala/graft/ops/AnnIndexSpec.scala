package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The materialized cell-partitioned IVF index: result-identical to the
  * computed-cell path, resumable via the stage manifest, and — the
  * point — partition-PRUNED: the probe reads only nProbe of the nCells
  * partition directories. */
class AnnIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("indexed IVF top-k: pruned scan, identical results, manifest resume") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0)
      .head().getAs[Seq[Float]]("embedding").toArray
    val base = Files.createTempDirectory("graft-annidx").toString

    AnnOps.buildIvfIndex(spark, base, emb, "vec_id", "embedding", "snap-1")
    // the table really is hive-partitioned by cell
    new java.io.File(s"$base/ann_ivf/data").list()
      .count(_.startsWith("cell=")) should be > 1

    val indexed = AnnOps.ivfTopKIndexed(spark, base, q, 10)
    // partition pruning: the cell filter reaches the scan as a
    // PartitionFilter (not a post-scan Filter over all rows)
    val p = indexed.queryExecution.executedPlan.toString
    p should include("PartitionFilters")
    "PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p) should not be empty

    // value-identity with the computed-cell path
    val computed = AnnOps.ivfTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.toSeq).toSeq
    indexed.collect().map(_.toSeq).toSeq shouldBe computed

    // resume: a second build with the same (snapshot, version) skips the
    // compute and reads the committed table
    val again = AnnOps.buildIvfIndex(spark, base, emb.limit(0), "vec_id",
      "embedding", "snap-1") // limit(0): would be wrong if recomputed
    again.count() shouldBe emb.count()
  }

  test("probe validates the committed codebook: mismatched parameters throw, never mis-probe") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0)
      .head().getAs[Seq[Float]]("embedding").toArray
    val base = Files.createTempDirectory("graft-annver").toString
    AnnOps.buildIvfIndex(spark, base, emb, "vec_id", "embedding", "snap-1",
      seed = 7L, nCells = 8, dim = q.length)

    // probing a store committed under different codebook parameters
    // would compute probe cells from the WRONG centroids — it must fail
    // loudly, not return plausible neighbors
    val e = intercept[IllegalStateException] {
      AnnOps.ivfTopKIndexed(spark, base, q, 5, seed = 42L, nCells = 16)
    }
    e.getMessage should include("codebook version")
    e.getMessage should include(AnnOps.ivfVersion(7L, 8, q.length))

    // a missing manifest (never built / crashed mid-write) also throws
    val empty = Files.createTempDirectory("graft-annnone").toString
    val e2 = intercept[IllegalStateException] {
      AnnOps.ivfTopKIndexed(spark, empty, q, 5)
    }
    e2.getMessage should include("no committed manifest")

    // matching parameters still probe fine
    AnnOps.ivfTopKIndexed(spark, base, q, 5, seed = 7L, nCells = 8)
      .count() shouldBe 5L
  }

  test("staged KG build materializes the content-embedding index; self-probe hits") {
    import graft.pipeline.Pipeline
    import graft.synth.{Synth, SynthConfig}
    val cfg = SynthConfig(nPages = 40L, nSites = 3, nEntities = 15)
    val dir = Files.createTempDirectory("graft-annstage").toString
    Pipeline.build(spark, Synth.pages(spark, cfg),
      Synth.aliases(spark, cfg), Synth.sameAs(spark, cfg), cfg.nPages,
      dir, "snap-1", 4)
    // the index exists as a cell-partitioned stage with a manifest
    graft.meta.Snapshot.readManifest(s"$dir/ann_ivf")
      .get.snapshotId shouldBe "snap-1"
    new java.io.File(s"$dir/ann_ivf/data").list()
      .count(_.startsWith("cell=")) should be > 1 // content varies cells
    // self-probe: query with a page's own content embedding → that page
    // is the top hit at cosine 1 (its own cell is the nearest centroid,
    // so the pruned probe must include it)
    val ex = spark.read.parquet(s"$dir/extracted/data")
      .select("url", "text").orderBy("url").head()
    val emb = new graft.enrich.Enrich.FakeEmbedder(Pipeline.AnnDim)
    val q = emb.embed(ex.getString(1))
    val top = AnnOps.ivfTopKIndexed(spark, dir, q, 3,
      seed = Pipeline.AnnSeed, nCells = Pipeline.AnnCells).head()
    top.getString(0) shouldBe ex.getString(0)
    top.getDouble(1) shouldBe 1.0
  }
}
