package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // production integration path: native functions + planner strategy
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // q29 aux dump: the flagship oracle re-derives all four triple
    // predicates in DuckDB SQL from these pipeline intermediates (the
    // pipeline is deterministic, so this run's intermediates equal the
    // ones behind the q29 result dumped above). Dot-prefixed so the
    // driver's result glob (fnmatch: '*' never matches a leading dot)
    // cannot list it as a pseudo-query row — it is an oracle input, not
    // a query result.
    try {
      import org.apache.spark.sql.functions.col
      val cfg = SparkEntry.KgOracleCfg
      val g = graft.pipeline.Pipeline.run(
        graft.synth.Synth.pages(spark, cfg),
        graft.synth.Synth.aliases(spark, cfg),
        graft.synth.Synth.sameAs(spark, cfg), cfg.nPages)
      val aux = s"$outDir/.aux_kg"
      g.extracted.toDF().select(col("url"), col("links"))
        .coalesce(1).write.mode("overwrite").parquet(s"$aux/extracted")
      g.linked.toDF().select(col("url"), col("entity_id"))
        .coalesce(1).write.mode("overwrite").parquet(s"$aux/linked")
      g.canon.toDF()
        .coalesce(1).write.mode("overwrite").parquet(s"$aux/canon")
      g.unpersist()
    } catch { case e: Throwable =>
      System.err.println(s"[verify] aux_kg dump failed: ${e.getMessage}")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // __AUX__ → the absolute aux_kg path (DuckDB runs from an arbitrary
    // cwd, so the oracle SQL must carry an absolute read_parquet path)
    val auxAbs = new java.io.File(s"$outDir/.aux_kg").getAbsolutePath
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__AUX__", auxAbs))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
