package graft.tools

import graft.streaming.StreamingIngest
import graft.synth.{Synth, SynthConfig}
import org.apache.spark.sql.SparkSession

/** spark-submit entry: drain all available page parquet from a landing
  * directory into an extracted-pages sink (Trigger.AvailableNow,
  * checkpointed — re-running ingests only newly landed files).
  *
  *   runMain graft.tools.StreamKg <landingDir> <outDir> <ckptDir> [seedPages]
  *
  * With seedPages > 0, first lands that many synthetic pages into
  * landingDir (demo mode).
  */
object StreamKg {
  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, ckptDir) = args.take(3)
    val seedPages = if (args.length > 3) args(3).toLong else 0L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // honor a spark-submit-provided master (cluster runs); default to
    // local[cpus] when launched standalone
    val builder0 = SparkSession.builder()
    val spark = (if (sys.props.contains("spark.master")) builder0
                 else builder0.master(s"local[$cpus]"))
      .appName("graft-stream-kg")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (seedPages > 0)
      Synth.pages(spark, SynthConfig(nPages = seedPages))
        .write.mode("append").parquet(inDir)
    val t0 = System.nanoTime()
    StreamingIngest.drainAvailable(spark, inDir, outDir, ckptDir)
    val secs = (System.nanoTime() - t0) / 1e9
    val n = StreamingIngest.readLatest(spark, outDir).count()
    println(f"[stream-kg] distinct_urls=$n wall=$secs%.1fs")
    spark.stop()
  }
}
