package graft.tools

import graft.extract.{Extract, HtmlText}
import graft.synth.{Synth, SynthConfig}
import org.apache.spark.sql.SparkSession

/** Scratch profiler: where does the extract stage's time go?
  * (parquet read / text scan / link scan / sha256 / xxh64 / dedup). */
object ExtractPhaseProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 32
    val nPages = if (args.length > 1) args(1).toLong else 100000L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("extract-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.parquet.columnarReaderBatchSize", "512")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val cfg = graft.synth.BenchInput.cfg(nPages)
    val inputDir = graft.synth.BenchInput.ensure(spark, nPages)
    def pages() = spark.read.parquet(inputDir).as[graft.model.PageRow]

    def t(name: String)(body: => Any): Unit = {
      body // warm
      val t0 = System.nanoTime(); body
      println(f"[extract-probe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("read+decode (html.length)") {
      pages().map(_.html.length.toLong).reduce(_ + _)
    }
    t("read+text scan") {
      pages().map(p => HtmlText.extract(p.html).length.toLong).reduce(_ + _)
    }
    t("read+link scan") {
      pages().map(p => HtmlText.extractLinks(p.html).length.toLong).reduce(_ + _)
    }
    t("read+text+sha256") {
      pages().map(p =>
        HtmlText.sha256Hex(HtmlText.extract(p.html)).length.toLong).reduce(_ + _)
    }
    t("read+xxh64") {
      pages().map(p => graft.util.Det.xxh64Bytes(p.html)).reduce(_ ^ _)
    }
    t("full extractOne map (no dedup)") {
      pages().map(p => Extract.extractOne(p).text.length.toLong).reduce(_ + _)
    }
    t("Extract.run (map + dedup shuffle)") {
      Extract.run(pages()).count()
    }
    t("pass1 alone (contestedUrls agg + checkpoint)") {
      import org.apache.spark.sql.functions._
      Extract.contestedUrls(pages()).localCheckpoint(false)
        .agg(count(lit(1)), count_if(col("c") > 1L)).head()
    }
    t("pass2 shape, no floor repartition (probe + extract at scan width)") {
      import org.apache.spark.sql.functions._
      val w = Extract.contestedUrls(pages()).localCheckpoint(false)
      w.agg(count(lit(1))).head()
      val keep = w.filter(col("c") === 1L && col("warc_ts").isNotNull)
        .select(col("url"), col("warc_ts").as("__win_ts"))
      pages().toDF()
        .join(broadcast(keep), Seq("url"), "left")
        .filter(col("__win_ts").isNull || col("warc_ts") === col("__win_ts"))
        .drop("__win_ts").as[graft.model.PageRow]
        .map(p => Extract.extractOne(p)).count()
    }
    spark.stop()
  }
}

/** Single-thread step attribution over a small sample (driver-side). */
object ExtractStepProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("extract-step-probe").config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val cfg = SynthConfig(nPages = 2000L, nSites = 50, nEntities = 1000,
      fillerParas = 30, mentionSlots = 12)
    val htmls = Synth.pages(spark, cfg).collect().map(_.html)
    def t(name: String)(body: => Any): Unit = {
      body; val t0 = System.nanoTime(); body
      println(f"[step-probe] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    t("decode") { htmls.foreach(HtmlText.decodeUtf8) }
    val strs = htmls.map(HtmlText.decodeUtf8)
    t("comment+scriptStyle excision scans") { strs.foreach(HtmlText.exciseSteps) }
    val afterRegex = strs.map(HtmlText.exciseSteps)
    t("fused scans (block/any/entities/ws)") {
      afterRegex.foreach(HtmlText.scanSteps)
    }
    t("full extractFromString") { strs.foreach(HtmlText.extractFromString) }
    t("link scan (scanner)") { htmls.foreach(HtmlText.extractLinks) }
    t("link scan (regex ref)") { htmls.foreach(HtmlText.extractLinksRef) }
    spark.stop()
  }
}
