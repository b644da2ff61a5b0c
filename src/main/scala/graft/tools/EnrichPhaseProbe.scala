package graft.tools

import graft.enrich.Enrich
import graft.extract.Extract
import graft.synth.{Synth, SynthConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for the enriched stage — the heaviest build stage
  * by lineage wall_ms. Times each sub-phase in isolation, then the full
  * nodeEnrichment, on the shared bench corpus.
  *
  *   runMain graft.tools.EnrichPhaseProbe [nPages] [cpus]
  */
object EnrichPhaseProbe {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 20000L
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-enrich-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cfg = graft.synth.BenchInput.cfg(nPages)
    val inputDir = graft.synth.BenchInput.ensure(spark, nPages)
    val extracted = Extract.run(
      spark.read.parquet(inputDir).as[graft.model.PageRow])
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    extracted.count()
    val linksTo = extracted.toDF()
      .select(col("url").as("subj"), explode(col("links")).as("obj"))
      .join(extracted.toDF().select(col("url").as("obj")), Seq("obj"),
        "left_semi").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    linksTo.count()

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[enrich-probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    // warm-up
    Enrich.pageSummaries(extracted).count()

    time("pageSummaries")(Enrich.pageSummaries(extracted).count())
    val ps = Enrich.pageSummaries(extracted)
    time("contextSummaries") {
      Enrich.contextSummaries(
        linksTo, ps.select(col("url"), col("summary"))).count()
    }
    time("pageNodeRows")(Enrich.pageNodeRows(ps, linksTo).count())
    time("internalNodeRows")(
      Enrich.internalNodeRows(Enrich.pageLeaves(ps)).count())
    time("nodeEnrichment FULL")(
      Enrich.nodeEnrichment(extracted, linksTo).count())
    time("nodeEnrichment again")(
      Enrich.nodeEnrichment(extracted, linksTo).count())
    spark.stop()
  }
}
