package graft.functions

import graft.SparkSpec
import graft.util.UrlKit
import org.apache.spark.sql.functions._

class PercentDecodeSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "a%20b%2Fc", "caf%C3%A9", "100%", "%GG", "plain", "%", "%2", "a%00b",
    "https://site0.example/p/1?q=%C3%BCber%20alles")

  test("native expression matches UrlKit on interpreted and codegen paths") {
    val df = samples.toDF("s")
      .select($"s", PercentDecode.percent_decode($"s").as("d"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    samples.foreach { s => got(s) shouldBe UrlKit.percentDecode(s) }
  }

  test("GraftExtensions injects percent_decode at session build (no register call)") {
    // TestSpark sets spark.sql.extensions=graft.GraftExtensions; the
    // function must resolve in SQL without PercentDecode.register.
    spark.sql("SELECT percent_decode('caf%C3%A9') AS d")
      .head().getString(0) shouldBe "café"
  }

  test("SQL registration works") {
    PercentDecode.register(spark)
    samples.toDF("s").createOrReplaceTempView("pd_samples")
    val got = spark.sql("SELECT s, percent_decode(s) d FROM pd_samples")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    samples.foreach { s => got(s) shouldBe UrlKit.percentDecode(s) }
  }

  test("null-safe; codegen path on a parquet-backed scan") {
    val df = Seq(Some("a%20b"), None).toDF("s")
      .select(PercentDecode.percent_decode($"s").as("d"))
    df.collect().map(r => Option(r.getString(0))) shouldBe
      Array(Some("a b"), None)
    // literal frames constant-fold to LocalTableScan; assert codegen on
    // a real scan ('*(n)' = WholeStageCodegen stage marker)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(PercentDecode.percent_decode(col("source")).as("d"))
    docs.queryExecution.executedPlan.toString should include("*(1) Project")
    docs.collect().length should be > 0
  }
}
