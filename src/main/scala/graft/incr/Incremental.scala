package graft.incr

import graft.extract.{Extract, HtmlText}
import graft.link.Link
import graft.mention.Mention
import graft.meta.Snapshot
import graft.model._
import graft.pipeline.Pipeline
import graft.canon.ConnectedComponents
import graft.emit.Emit
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental rebuild — the Spark shape of the reference's GraphUpdater
  * (clangd_graph_rag_updater.py:43-82, SURVEY.md §3.2):
  *
  *   snapshot diff (≙ git diff-tree J13) → dirty-scope expansion to
  *   url-hash buckets → per-bucket dynamic partition OVERWRITE of the
  *   url-keyed stage tables (≙ purge-stale + rebuild-dirty) → re-derive
  *   downstream graph tables → stamp the new snapshot id.
  *
  * Scale rationale: extraction + mention detection + linking dominate
  * cost (full HTML parse per page) and are strictly url-local, so they
  * rebuild only dirty buckets. The graph emit (triples/nodes/adjacency)
  * is re-derived from the incrementally-maintained stage tables — it is
  * a few cheap column-pruned joins over already-extracted rows, and
  * relates_to/canonicalization are global by nature (same trade the
  * reference makes when it re-runs downstream passes on the dirty
  * scope).
  */
object Incremental {

  /** Snapshot diff on url: added / deleted / changed / unchanged,
    * comparing the (deduped) html payload hash. */
  def diff(oldPages: Dataset[PageRow], newPages: Dataset[PageRow]): DataFrame = {
    // per-url winning html hash without shuffling html bodies: map-side
    // partial max_by moves only (url, ts, hash) tuples across the wire
    def urlHash(p: Dataset[PageRow], out: String): DataFrame =
      p.toDF()
        .select(col("url"), col("warc_ts"), xxhash64(col("html")).as("h"))
        .groupBy(col("url"))
        .agg(max_by(col("h"), struct(col("warc_ts"), col("h"))).as(out))
    val o = urlHash(oldPages, "old_h")
    val n = urlHash(newPages, "new_h")
    o.join(n, Seq("url"), "full_outer")
      .select(col("url"),
        when(col("old_h").isNull, lit("added"))
          .when(col("new_h").isNull, lit("deleted"))
          .when(col("old_h") =!= col("new_h"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Buckets containing any non-unchanged url (collected — bucket count
    * is small and bounded, e.g. 2^14 at cluster scale). */
  def dirtyBuckets(d: DataFrame, nBuckets: Int): Seq[Long] =
    d.filter(col("status") =!= "unchanged")
      .select(Pipeline.bucketOf(col("url"), nBuckets).as("bucket"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted

  /** Incrementally update a `Pipeline.build` output directory in place.
    * Returns the dirty bucket list (empty → nothing to do). */
  def update(
      spark: SparkSession,
      oldPages: Dataset[PageRow],
      newPages: Dataset[PageRow],
      aliases: Dataset[AliasRow],
      sameas: Dataset[SameAsEdge],
      nPages: Long,
      outDir: String,
      newSnapshotId: String,
      nBuckets: Int = 32): Seq[Long] = {
    import spark.implicits._

    val d = diff(oldPages, newPages).cache()
    val dirty = dirtyBuckets(d, nBuckets)
    d.unpersist()
    if (dirty.isEmpty) return dirty

    // mark every stage in-progress BEFORE any data dir is touched: a kill
    // mid-update must not leave old manifests pointing at mixed data
    // (they are re-stamped with the new snapshot id at the end)
    Seq("extracted", "linked", "canon", "triples", "nodes", "adjacency",
      "enriched").foreach(s => Snapshot.invalidate(s"$outDir/$s"))

    // rebuild the FULL dirty buckets from the new snapshot (a bucket is
    // the overwrite unit; urls deleted from the snapshot vanish with it)
    val inDirty = Pipeline.bucketOf(col("url"), nBuckets).isin(dirty: _*)
    val pagesDirty = newPages.filter(inDirty) // Extract.run dedups by url

    val extractedDirty = Extract.run(pagesDirty).toDF()
      .withColumn("bucket", Pipeline.bucketOf(col("url"), nBuckets))
      .repartition(col("bucket"))

    withDynamicOverwrite(spark) {
      extractedDirty.write.mode(SaveMode.Overwrite)
        .partitionBy("bucket").parquet(s"$outDir/extracted/data")
    }

    val ex = spark.read.parquet(s"$outDir/extracted/data")
      .drop("bucket").as[ExtractedPage]
    val exDirty = spark.read.parquet(s"$outDir/extracted/data")
      .filter(col("bucket").isin(dirty: _*)).drop("bucket").as[ExtractedPage]

    val linkedDirty =
      Link.resolve(Mention.detect(exDirty, aliases), nPages).toDF()
        .withColumn("bucket", Pipeline.bucketOf(col("url"), nBuckets))
        .repartition(col("bucket"))
    withDynamicOverwrite(spark) {
      linkedDirty.write.mode(SaveMode.Overwrite)
        .partitionBy("bucket").parquet(s"$outDir/linked/data")
    }

    // downstream graph tables re-derived from the updated stage tables
    val lk = spark.read.parquet(s"$outDir/linked/data")
      .drop("bucket").as[LinkedMention]
    val entities = aliases.map(a => java.lang.Long.valueOf(a.entity_id)).distinct()
    val canon = ConnectedComponents.canonMap(entities, sameas)
    canon.toDF().write.mode(SaveMode.Overwrite).parquet(s"$outDir/canon/data")

    val triples = Emit.triples(ex, lk, canon)
    triples.toDF()
      .withColumn("bucket", Pipeline.bucketOf(col("subj"), nBuckets))
      .repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(s"$outDir/triples/data")
    val t = spark.read.parquet(s"$outDir/triples/data").drop("bucket").as[TripleRow]
    Emit.dropOrphans(Emit.nodes(ex, t, Some(newSnapshotId)), t).toDF()
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/nodes/data")
    Emit.adjacency(t).toDF()
      .withColumn("bucket", Pipeline.bucketOf(col("src"), nBuckets))
      .repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(s"$outDir/adjacency/data")

    val lt = spark.read.parquet(s"$outDir/triples/data")
      .filter(col("pred") === Pred.LinksTo).select(col("subj"), col("obj"))
    graft.enrich.Enrich.nodeEnrichment(ex, lt)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/enriched/data")

    // stamp manifests with the new snapshot id (≙ PROJECT.commit_hash
    // stamp, clangd_graph_rag_builder.py:112-122)
    Seq("extracted" -> HtmlText.VERSION, "linked" -> "link-v1",
      "canon" -> "canon-v1", "triples" -> "emit-v1", "nodes" -> "emit-v1",
      "adjacency" -> "emit-v1", "enriched" -> "enrich-v1").foreach {
      case (stage, v) => Snapshot.stamp(spark, outDir, stage, newSnapshotId, v)
    }
    dirty
  }

  private def withDynamicOverwrite[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
