package graft.tools

import graft.incr.Incremental
import graft.synth.{Synth, SynthConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entry: incrementally update a BuildKg output directory
  * from snapshot A (nPagesOld) to snapshot B (nPagesNew, with the demo
  * mutation: pages 5/17/42 changed). Demonstrates the dirty-bucket
  * rebuild path end-to-end.
  *
  *   runMain graft.tools.UpdateKg <outDir> <nPagesOld> <nPagesNew> [nBuckets]
  */
object UpdateKg {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val nOld = args(1).toLong
    val nNew = args(2).toLong
    val nBuckets = if (args.length > 3) args(3).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // honor a spark-submit-provided master (cluster runs); default to
    // local[cpus] when launched standalone
    val builder0 = SparkSession.builder()
    val spark = (if (sys.props.contains("spark.master")) builder0
                 else builder0.master(s"local[$cpus]"))
      .appName("graft-update-kg")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cfgOld = SynthConfig(nPages = nOld)
    val cfgNew = SynthConfig(nPages = nNew)
    val oldPages = Synth.pages(spark, cfgOld)
    val newPages = Synth.pages(spark, cfgNew).map { p =>
      if (Seq(5L, 17L, 42L).exists(i => p.url.endsWith(s"/$i")))
        p.copy(html = (new String(p.html, "UTF-8")
          .replace("</body>", "<p>updated acme globex</p></body>")).getBytes("UTF-8"))
      else p
    }
    val t0 = System.nanoTime()
    val dirty = Incremental.update(spark, oldPages, newPages,
      Synth.aliases(spark, cfgNew), Synth.sameAs(spark, cfgNew),
      nNew, outDir, s"synth-seed42-n$nNew-upd", nBuckets)
    val secs = (System.nanoTime() - t0) / 1e9
    val triples = spark.read.parquet(s"$outDir/triples/data").count()
    println(f"[update-kg] dirtyBuckets=${dirty.size}/$nBuckets triples=$triples wall=$secs%.1fs")
    spark.stop()
  }
}
