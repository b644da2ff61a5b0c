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
}
