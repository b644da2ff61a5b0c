package graft.tools

import graft.pipeline.Pipeline
import graft.synth.{Synth, SynthConfig}
import org.apache.spark.sql.SparkSession

/** spark-submit entry point: synthesize the deterministic fixture corpus
  * and run the full staged KG build into `outDir`.
  *
  *   runMain graft.tools.BuildKg <outDir> [nPages] [nBuckets] [snapshotId]
  *
  * Re-running with the same snapshotId resumes from the last committed
  * stage (SURVEY.md §7.6).
  */
object BuildKg {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val nPages = if (args.length > 1) args(1).toLong else 1000L
    val nBuckets = if (args.length > 2) args(2).toInt else 32
    val snapshotId =
      if (args.length > 3) args(3) else s"synth-seed42-n$nPages"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // honor a spark-submit-provided master (cluster runs); default to
    // local[cpus] when launched standalone
    val builder0 = SparkSession.builder()
    val spark = (if (sys.props.contains("spark.master")) builder0
                 else builder0.master(s"local[$cpus]"))
      .appName("graft-build-kg")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = SynthConfig(nPages = nPages)
    val t0 = System.nanoTime()
    Pipeline.build(spark, Synth.pages(spark, cfg), Synth.aliases(spark, cfg),
      Synth.sameAs(spark, cfg), cfg.nPages, outDir, snapshotId, nBuckets)
    val secs = (System.nanoTime() - t0) / 1e9
    val triples = spark.read.parquet(s"$outDir/triples/data").count()
    val nodes = spark.read.parquet(s"$outDir/nodes/data").count()
    println(f"[build-kg] pages=$nPages triples=$triples nodes=$nodes " +
      f"wall=$secs%.1fs docs/sec=${nPages / secs}%.0f triples/sec=${triples / secs}%.0f")
    spark.stop()
  }
}
