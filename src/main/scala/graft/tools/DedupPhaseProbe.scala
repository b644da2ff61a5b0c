package graft.tools

import graft.ops.{DedupOps, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the dedup query phases at a given SF dir. */
object DedupPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]").appName("dedup-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t(name: String)(body: => Any): Unit = {
      body // warm
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    t("tokens only") {
      docs.select(size(TextOps.tokens(col("text"))).as("n"))
        .agg(sum(col("n"))).head().getLong(0)
    }
    t("shingles") {
      docs.select(size(DedupOps.shingles(TextOps.tokens(col("text")), 3)).as("n"))
        .agg(sum(col("n"))).head().getLong(0)
    }
    val sh = docs.select(col("doc_id").as("id"),
      explode(DedupOps.shingles(TextOps.tokens(col("text")), 3)).as("s"))
    t("exploded shingle rows") { sh.count() }
    t("self-join pair count") {
      sh.as("a").join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .groupBy(col("a.id"), col("b.id")).count().count()
    }
    t("native sig k=8") {
      docs.select(col("doc_id"),
          DedupOps.minhashSigFromShingles(
            DedupOps.shingles(TextOps.tokens(col("text")), 3), 8).as("sig"))
        .select(sum(size(col("sig")))).head().getLong(0)
    }
    t("q21 full") {
      DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.35).count()
    }
    t("q22 full") {
      DedupOps.minhashCandidates(docs, "doc_id", "text", 3, 4, 2).count()
    }
    spark.stop()
  }
}
