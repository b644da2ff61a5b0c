package graft.tools

import java.sql.Timestamp

import graft.model.ExtractedPage
import graft.streaming.StreamingIngest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Scratch probe for the transformWithState near-dup gate: is the
  * AvailableNow drain bounded, and what does each phase cost? */
object TwsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("tws-probe")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val mem = MemoryStream[ExtractedPage]
    val out = StreamingIngest.nearDupGateTws(mem.toDS(), n = 3, k = 8,
      ttl = java.time.Duration.ofHours(2))
    val ckpt = java.nio.file.Files.createTempDirectory("tws-probe-ckpt").toString
    val q = out.writeStream.format("memory").queryName("tws_probe")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    def awaitRows(tag: String, want: Long): Unit = {
      val t0 = System.nanoTime()
      val deadline = t0 + 90L * 1000 * 1000 * 1000
      while (spark.table("tws_probe").count() < want &&
        System.nanoTime() < deadline) Thread.sleep(200)
      println(f"[tws-probe] $tag rows=${spark.table("tws_probe").count()} " +
        f"after ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def page(url: String, ts: Long, text: String, xxh: Long = 0L) =
      ExtractedPage(url, "s", new Timestamp(ts), text, "en", Nil, "sha", xxh)
    val m = 60L * 1000L
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "a completely different document about spark catalyst plans"
    mem.addData(page("u2", 60 * m, textA, xxh = 9L),
      page("u1", 60 * m, textA, xxh = 3L), page("u3", 61 * m, textB))
    awaitRows("phase1", 2)
    println("[tws-probe] admitted: " +
      spark.table("tws_probe").collect().map(_.getString(0)).sorted.mkString(","))
    mem.addData(page("u4", 65 * m, textA))
    Thread.sleep(3000) // give the suppressed row several trigger cycles
    println("[tws-probe] rows after phase2: " + spark.table("tws_probe").count())
    q.stop()
    spark.stop()
  }
}
