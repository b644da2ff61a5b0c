package graft.tools

import graft.extract.{Extract, HtmlText}
import graft.synth.{Synth, SynthConfig}
import graft.util.Det
import org.apache.spark.sql.SparkSession

/** Micro scaling probes: which layer stops scaling with cores? */
object MicroScale {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val nPages = if (args.length > 1) args(1).toLong else 200000L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName(s"micro-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[T](name: String)(body: => T): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[micro] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val cfg = SynthConfig(nPages = nPages, nSites = 50,
      nEntities = math.max(100, (nPages / 100).toInt))
    // warmups
    spark.range(1000).map(x => Det.mix64(x)).reduce(_ ^ _)
    Extract.run(Synth.pages(spark, cfg.copy(nPages = 200L))).count()

    t("pure-cpu mix64 x200M") {
      spark.range(200000000L).map(x => Det.mix64(x)).reduce(_ ^ _)
    }
    t("synth-only") {
      Synth.pages(spark, cfg).map(_.html.length).reduce(_ + _)
    }
    t("synth+extract-text") {
      Synth.pages(spark, cfg).map(p => HtmlText.extract(p.html).length).reduce(_ + _)
    }
    t("synth+extract-full (sha256+links)") {
      Extract.run(Synth.pages(spark, cfg)).count()
    }
    spark.stop()
  }
}
