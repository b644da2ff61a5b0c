package graft.tools

import graft.ops.IntervalJoin
import graft.util.Det
import org.apache.spark.sql.SparkSession

/** Micro-benchmark for the three interval first-match implementations:
  * typed cogroup, custom Catalyst Exec (planned), and the declarative
  * join+min_by shape. Deterministic synthetic input via mix64 —
  * args: [cpus] [nPoints] [nIntervals] [nKeys].
  */
object IntervalBench {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 32
    val nPoints = if (args.length > 1) args(1).toLong else 20000000L
    val nIntervals = if (args.length > 2) args(2).toLong else 2000000L
    val nKeys = if (args.length > 3) args(3).toLong else 100000L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("interval-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // values in [0, 1e6); interval width ~ mix-derived in [0, 2000)
    val pts = spark.range(nPoints).map { i =>
      IntervalJoin.Point(Math.floorMod(Det.mix64(i), nKeys),
        Math.floorMod(Det.mix64(i + 7), 1000000L).toDouble, i)
    }.localCheckpoint()
    val ivs = spark.range(nIntervals).map { i =>
      val lo = Math.floorMod(Det.mix64(i + 13), 1000000L).toDouble
      IntervalJoin.Interval(Math.floorMod(Det.mix64(i + 3), nKeys),
        lo, lo + Math.floorMod(Det.mix64(i + 29), 2000L).toDouble, i)
    }.localCheckpoint()

    def timeMin3(name: String)(body: => Long): Unit = {
      body // warm
      var best = Double.MaxValue
      var rows = 0L
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        rows = body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[interval-bench] $name rows=$rows min3=$best%.2f s " +
        f"(${nPoints / best / 1e6}%.1f M points/s)")
    }

    timeMin3("planned-exec") {
      IntervalJoin.firstMatchPlanned(pts, ivs).count()
    }
    timeMin3("typed-cogroup") {
      IntervalJoin.firstMatch(pts, ivs).count()
    }
    timeMin3("join+min_by") {
      IntervalJoin.firstMatchSql(pts.toDF(), ivs.toDF()).count()
    }
    spark.stop()
  }
}
