package graft.tools

import graft.canon.ConnectedComponents
import graft.emit.{Emit, Hierarchy}
import graft.extract.Extract
import graft.link.Link
import graft.mention.Mention
import graft.synth.{Synth, SynthConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the emit-stage branches (which triple branch
  * costs what at a given parallelism). */
object EmitPhaseProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 32
    val nPages = if (args.length > 1) args(1).toLong else 100000L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("emit-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      // ≈20 KB rows: default 4096-row reader batches OOM 32 readers
      .config("spark.sql.parquet.columnarReaderBatchSize", "512")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val cfg = graft.synth.BenchInput.cfg(nPages)
    val inputDir = graft.synth.BenchInput.ensure(spark, nPages)

    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[emit-probe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val pages = spark.read.parquet(inputDir).as[graft.model.PageRow]
    val extracted = Extract.run(pages).persist()
    extracted.count()
    val cands = Mention.detect(extracted, Synth.aliases(spark, cfg)).persist()
    cands.count()
    val linked = Link.resolve(cands, cfg.nPages).persist()
    linked.count()
    val entities = Synth.aliases(spark, cfg)
      .map(a => java.lang.Long.valueOf(a.entity_id)).distinct()
    val canon = ConnectedComponents.canonMap(entities, Synth.sameAs(spark, cfg))
      .persist()
    canon.count()
    val ex = extracted.toDF()
    // warm
    Emit.pageEntities(linked, canon).count()

    val pe = t("pageEntities (canon join + distinct)") {
      val p = Emit.pageEntities(linked, canon).persist(); p.count(); p
    }
    val peSets = t("pageEntitySets (canon join + url agg)") {
      val p = Emit.pageEntitySets(linked, canon).persist(); p.count(); p
    }
    t("contains (hierarchy)") {
      Hierarchy.containsEdges(ex.select($"url")).count()
    }
    t("linksTo (semi + distinct)") {
      ex.select($"url".as("subj"), explode($"links").as("obj"))
        .join(ex.select($"url".as("obj")), Seq("obj"), "left_semi")
        .distinct().count()
    }
    t("relates (capped pairs, from distinct rows)") { Emit.relatesPairs(pe).count() }
    t("relates (capped pairs, from sets)") { Emit.relatesFromSets(peSets).count() }
    t("full triples") { Emit.triples(extracted, linked, canon, Some(peSets)).count() }
    t("nodes + dropOrphans") {
      Emit.dropOrphans(Emit.nodes(extracted, canon),
        Emit.triples(extracted, linked, canon, Some(peSets))).count()
    }
    spark.stop()
  }
}
