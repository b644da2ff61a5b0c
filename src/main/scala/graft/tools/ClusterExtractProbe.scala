package graft.tools

import graft.extract.Extract
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for the extract leg under REAL separate executor
  * JVMs: times the key-width dedup (round 5), the wide-shuffle plan it
  * replaced, and their components (pass-1 key aggregation alone; a
  * no-dedup extract-everything scan as the lower bound) on the shared
  * bench input.
  *
  *   sbt package && sbt "runMain graft.tools.ClusterExtractProbe <workers> <coresPerWorker> <nPages>"
  */
object ClusterExtractProbe {
  def main(args: Array[String]): Unit = {
    val nWorkers = args(0).toInt
    val coresPerWorker = args(1).toInt
    val nPages = if (args.length > 2) args(2).toLong else 50000L
    val totalCores = nWorkers * coresPerWorker

    val jar = new java.io.File(
      "target/scala-2.13/clangdtoneo4jspark_2.13-0.1.0.jar").getAbsolutePath
    require(new java.io.File(jar).exists(), s"run `sbt package` first: $jar")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ") +
      // same ActiveProcessorCount policy (and A/B toggle) as
      // ClusterScalingBench so probe numbers compose with bench numbers
      (if (sys.env.get("SPARK_GRAFT_APC").contains("off")) ""
       else s" -XX:ActiveProcessorCount=$coresPerWorker")
    val execMb = sys.env.getOrElse("SPARK_GRAFT_EXEC_MB", "4096").toInt
    val spark = SparkSession.builder()
      .master(s"local-cluster[$nWorkers, $coresPerWorker, $execMb]")
      .appName(s"graft-extract-probe-$nWorkers-x-$coresPerWorker")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", totalCores.toString))
      .config("spark.jars", jar)
      .config("spark.executor.memory", s"${execMb}m")
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.parquet.columnarReaderBatchSize", "512")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val inputDir = graft.synth.BenchInput.ensure(spark, nPages)
    def pages() = spark.read.parquet(inputDir).as[graft.model.PageRow]

    // shuffle-write bytes per timed block, summed from TaskEnd metrics
    // (the VERDICT "Done" evidence: key-width dedup must shuffle ~40 B
    // per row where the wide plan shuffled the full extracted record)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            ()
          }
        }
      })

    def t(name: String)(body: => Any): Unit = {
      body // warm
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
      Thread.sleep(1000) // listener bus drain before reading the counter
      shuffleBytes.set(0L)
      body
      Thread.sleep(1000)
      val mb = shuffleBytes.get() / 1e6
      println(f"[cluster-extract-probe] $nWorkers x $coresPerWorker $name " +
        f"$secs%.2f s  shuffle-write $mb%.1f MB")
    }

    // consume like the PIPELINE does — referencing the heavy columns.
    // A bare count() lets Catalyst prune the max_by payload to keys-only
    // BEFORE the exchange (measured: the "wide" plan shuffled 0.8 MB at
    // 50k pages under count() vs the ~600 MB the persisted extracted
    // stage actually pays), flattering exactly the plan under test.
    def consume(ds: org.apache.spark.sql.Dataset[graft.model.ExtractedPage]): Unit = {
      ds.toDF().select(sum(length($"text")), sum(size($"links")),
        sum(length($"text_sha256")), sum($"html_xxh64" * 0)).collect()
      ()
    }
    t("narrow winner pass alone (pass-1 shape, html pruned)") {
      pages().toDF().select($"url", $"warc_ts")
        .groupBy($"url", $"warc_ts").agg(count(lit(1)).as("c"))
        .groupBy($"url").agg(sum($"c").as("n"))
        .filter($"n" > 1).count()
    }
    t("scan+hash pass (first-cut pass-1: reads all html)") {
      pages().toDF().select($"url", $"warc_ts", xxhash64($"html").as("h"))
        .groupBy($"url", $"warc_ts", $"h").agg(count(lit(1)).as("c"))
        .groupBy($"url").agg(sum($"c").as("n"))
        .filter($"n" > 1).count()
    }
    t("extract-everything, no dedup (lower bound)") {
      consume(pages().map(p => Extract.extractOne(p)))
    }
    t("key-width run (round 5)") { consume(Extract.run(pages())) }
    t("wide-shuffle run (round 4)") { consume(Extract.runWideShuffle(pages())) }
    // the PIPELINE's extract leg is persist(MEMORY_AND_DISK) + count —
    // the columnar cache build is its own cost center on ~12 KB rows, so
    // time it separately for both dedup plans (the bench legs' gap vs
    // the consume() blocks above is exactly this)
    def persisted(name: String)(mk: => org.apache.spark.sql.Dataset[graft.model.ExtractedPage]): Unit =
      t(name) {
        val e = mk.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        e.count()
        e.unpersist(blocking = true)
      }
    persisted("key-width + persist + count (pipeline extract-leg shape)") {
      Extract.run(pages())
    }
    persisted("wide-shuffle + persist + count (round-4 extract-leg shape)") {
      Extract.runWideShuffle(pages())
    }
    spark.stop()
  }
}
