package graft.tools

import java.sql.Timestamp

import graft.incr.Incremental
import graft.pipeline.Pipeline
import graft.synth.{Synth, SynthConfig}
import org.apache.spark.sql.SparkSession

/** Incremental-vs-full-rebuild wall-time evidence on the realistic page
  * shape (≈20 KB html — extraction-dominant, like a real crawl):
  *
  *   runMain graft.tools.IncrementalBench [nPages] [nBuckets] [nChanged]
  *
  * The mutation is ALIAS-NEUTRAL (appends non-dictionary filler), so the
  * relink scope is exactly the dirty buckets — the favorable case the
  * bucket design optimizes for. A mutation that changes a head alias's
  * document frequency correctly forces a global relink instead
  * (incremental ≡ full rebuild comes first); UpdateKg demos that path.
  * Prints one JSON line with both walls.
  */
object IncrementalBench {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 20000L
    val nBuckets = if (args.length > 1) args(1).toInt else 32
    val nChanged = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-incr-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.columnarReaderBatchSize", "512")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cfg = graft.synth.BenchInput.cfg(nPages)
    val inputDir = graft.synth.BenchInput.ensure(spark, nPages)
    def oldPages() = spark.read.parquet(inputDir).as[graft.model.PageRow]
    val changed = (1 to nChanged).map(i => s"/${i * 7}")
    def newPages() = oldPages().map { p =>
      if (changed.exists(p.url.endsWith))
        p.copy(
          warc_ts = new Timestamp(p.warc_ts.getTime + 7200000L),
          html = (new String(p.html, "UTF-8")
            .replace("</body>", "<p>zzfiller qqfiller</p></body>"))
            .getBytes("UTF-8"))
      else p
    }

    val outDir = java.nio.file.Files
      .createTempDirectory("graft-incr-bench").toString
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val fullSecs = time {
      Pipeline.build(spark, oldPages(), Synth.aliases(spark, cfg),
        Synth.sameAs(spark, cfg), cfg.nPages, outDir, "snap-old", nBuckets)
    }
    var dirty = Seq.empty[Long]
    val updSecs = time {
      // production path: diff against the persisted urlhash stage — the
      // old corpus is never read
      dirty = Incremental.updateFromStored(spark, newPages(),
        Synth.aliases(spark, cfg), Synth.sameAs(spark, cfg), cfg.nPages,
        outDir, "snap-new", nBuckets)
    }
    println(f"""{"bench":"incremental","pages":$nPages,"buckets":$nBuckets,""" +
      f""""changed_pages":$nChanged,"dirty_buckets":${dirty.size},""" +
      f""""full_build_secs":$fullSecs%.2f,"update_secs":$updSecs%.2f,""" +
      f""""speedup":${fullSecs / updSecs}%.2f}""")
    spark.stop()
  }
}
