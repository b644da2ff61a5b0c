package graft.tools

import org.apache.spark.sql.SparkSession

/** Pre-materialize bench input tables at full local parallelism, so a
  * low-core local-cluster session never pays (or skews) corpus
  * synthesis: `runMain graft.tools.GenBenchInput <nPages> [<nPages>...]`.
  * Layout contract (part-file count) lives in [[graft.synth.BenchInput]].
  */
object GenBenchInput {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GenBenchInput <nPages> [<nPages>...]")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-gen-bench-input")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { n =>
      val dir = graft.synth.BenchInput.ensure(spark, n.toLong)
      val files = Option(new java.io.File(dir).list()).map(_.count(f =>
        f.startsWith("part-") && f.endsWith(".parquet"))).getOrElse(0)
      println(s"[gen-bench-input] $dir ready: $files part files")
    }
    spark.stop()
  }
}
