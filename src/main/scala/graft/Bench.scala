package graft

import graft.pipeline.Pipeline
import graft.synth.{Synth, SynthConfig}
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR plus the KG pipeline end-to-end on the synthetic
  * corpus, and prints ONE JSON line.
  *
  * Extra keys (kg_*) ride along for BENCH/BASELINE.md; the required
  * driver keys (metric/value/unit/queries/sf) are unchanged.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val kgPages = sys.env.getOrElse("SPARK_GRAFT_KG_PAGES", "20000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // KG pipeline end-to-end (docs/sec, triples/sec are the north-star
    // metrics — BASELINE.json)
    // realistic page shape (tens of KB, ~6 mentions/page) — matches
    // ScalingBench so docs/sec is comparable across BENCH/BASELINE.md.
    // Input is a materialized parquet table (north rule: pages arrive
    // as a table); generation is not part of the measured pipeline.
    import spark.implicits._
    var kgTriples = 0L
    def kgOnce(pages: Long): Double = {
      val cfg = graft.synth.BenchInput.cfg(pages)
      // ensure() also validates BenchInput's part-file-count contract —
      // a stale table from an older generator caps scan parallelism
      val inputDir = graft.synth.BenchInput.ensure(spark, pages)
      // wide-binary corpus (≈20 KB html/row): the default 4096-row
      // vectorized-reader batch costs ~80 MB per concurrent reader — 512
      // keeps 32 readers + the pipeline cache inside the heap. Scoped to
      // the KG leg only: narrow-row query scans prefer the default.
      spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "512")
      try time {
        val g = Pipeline.run(
          spark.read.parquet(inputDir).as[graft.model.PageRow],
          Synth.aliases(spark, cfg), Synth.sameAs(spark, cfg), cfg.nPages)
        kgTriples = g.triples.count()
        g.unpersist()
      } finally spark.conf.unset("spark.sql.parquet.columnarReaderBatchSize")
    }
    // Warm-up + min-of-3: the first Spark jobs in a JVM pay JIT + codegen
    // compile, which is harness overhead, not engine throughput (same
    // protocol as tools/ScalingBench). Round-1 reported the cold run and
    // under-stated docs/sec by ~10x.
    kgOnce(kgPages)
    val kgSecs = (1 to 3).map(_ => kgOnce(kgPages)).min
    val kgTriples20k = kgTriples
    // a 20k-page run on 32 cores is latency-dominated (~3.5 s of driver/
    // job fixed cost); a 5x corpus shows the amortized engine rate the
    // 100 TB target actually cares about — both are reported
    val kgBigPages = kgPages * 5
    val kgBigSecs = (1 to 2).map(_ => kgOnce(kgBigPages)).min
    val kgBigTriples = kgTriples
    kgTriples = kgTriples20k

    // A throwing query must be LOUD: it is excluded from the timing map
    // and reported in an explicit "errors" object (a -1s contribution to
    // the total would let a silently-broken query print a plausible line).
    // min-of-2 per query: the first execution right after the kg legs
    // absorbs residual JIT/GC/codegen — a loaded window inflated q01-q05
    // by 4-10x in the round-4 driver run (confirmed noise by an idle
    // re-run); the second pass makes the reported number robust to it.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): (Double, Option[String]) = {
        val t0 = System.nanoTime()
        val r = try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(120))
        }
        ((System.nanoTime() - t0) / 1e9, r)
      }
      val (t1, r1) = once()
      val (t, r) = if (r1.isDefined) (t1, r1) else {
        val (t2, r2) = once()
        (math.min(t1, t2), r2)
      }
      (name, t, r)
    }
    val qs = results.collect { case (k, v, None) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) =>
      "\"" + k + "\":\"" + m.replaceAll("[\"\\\\\\n\\r\\t]", " ") + "\""
    }
    val errJson =
      if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum + kgSecs
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"$errJson,"""
        + f""""kg_pages":$kgPages,"kg_triples":$kgTriples,"kg_secs":$kgSecs%.3f,"""
        + f""""kg_docs_per_sec":${kgPages / kgSecs}%.1f,"kg_triples_per_sec":${kgTriples / kgSecs}%.1f,"""
        + f""""kg_big_pages":$kgBigPages,"kg_big_secs":$kgBigSecs%.3f,"""
        + f""""kg_big_docs_per_sec":${kgBigPages / kgBigSecs}%.1f,"kg_big_triples_per_sec":${kgBigTriples / kgBigSecs}%.1f,"cpus":"$cpus"}""")
    spark.stop()
  }
}
