package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(concat(lit("https://ex.com/a/b/"), col("doc_id")).as("url"))
      .persist()
    docs.count()
    val a = graft.emit.Hierarchy.internalNodes(docs)
    a.count()
    println("=== internalNodes FINAL ===")
    println(a.queryExecution.executedPlan.toString)
    val b = docs.select(graft.emit.Hierarchy.parentOf(col("url")).as("subj"),
      col("url").as("obj")).distinct()
    b.count()
    println("=== parentOf distinct FINAL ===")
    println(b.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
