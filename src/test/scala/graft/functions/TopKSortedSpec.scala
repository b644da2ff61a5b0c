package graft.functions

import graft.SparkSpec
import graft.functions.TopKSorted.topk_sorted
import org.apache.spark.sql.functions._

/** The bounded top-K aggregate must agree value-for-value with the
  * slice-after-collect declarative shapes it replaced in Enrich, AND its
  * buffer bound must hold structurally (peak map size ≤ k) even on a
  * head group orders of magnitude larger than the cap. */
class TopKSortedSpec extends SparkSpec {
  import spark.implicits._

  // deterministic skewed corpus: one head key with 5000 values, many
  // small groups, duplicate values within groups, some nulls
  private def corpus = {
    val rows = (0 until 5000).map(i => ("head", f"v${(i * 37) % 900}%04d")) ++
      (0 until 400).flatMap(g => (0 until (g % 7)).map(j =>
        (s"g$g", f"v${(j * 13 + g) % 50}%04d"))) ++
      Seq(("head", null), ("g1", null))
    rows.toDF("key", "value")
  }

  test("distinct mode equals slice(array_sort(collect_set), 1, k) on every group") {
    for (k <- Seq(1, 7, 64)) {
      val got = corpus.groupBy($"key")
        .agg(topk_sorted($"value", k, distinct = true).as("t"))
      val want = corpus.groupBy($"key")
        .agg(slice(array_sort(collect_set($"value")), 1, k).as("t"))
      got.join(want.withColumnRenamed("t", "w"), Seq("key"))
        .filter(!($"t" <=> $"w")).count() shouldBe 0L
    }
  }

  test("multiset mode equals slice(array_sort(collect_list), 1, k) on every group") {
    for (k <- Seq(1, 7, 64)) {
      val got = corpus.groupBy($"key")
        .agg(topk_sorted($"value", k, distinct = false).as("t"))
      val want = corpus.groupBy($"key")
        .agg(slice(array_sort(collect_list($"value")), 1, k).as("t"))
      got.join(want.withColumnRenamed("t", "w"), Seq("key"))
        .filter(!($"t" <=> $"w")).count() shouldBe 0L
    }
  }

  test("parallelism-invariant: same result at 1 and 13 partitions") {
    val a = corpus.repartition(1).groupBy($"key")
      .agg(topk_sorted($"value", 16, distinct = false).as("t"))
      .orderBy("key").collect().map(_.toSeq).toSeq
    val b = corpus.repartition(13).groupBy($"key")
      .agg(topk_sorted($"value", 16, distinct = false).as("t"))
      .orderBy("key").collect().map(_.toSeq).toSeq
    a shouldBe b
  }

  test("structural bound: 10^6-child head group never holds more than cap elements in any buffer") {
    val cap = 64
    // one head parent with a million distinct child summaries — the
    // scenario the slice-after-collect shape buffered whole (multi-GB at
    // real summary sizes). Values descend so naive insertion would keep
    // growing without eviction-on-insert.
    val big = spark.range(1000000L).select(
      lit("head").as("key"),
      format_string("s%07d", lit(999999L) - col("id")).as("value"))
    TopKSorted.resetPeak()
    TopKSorted.peakTracking = true
    try {
      val r = big.groupBy($"key")
        .agg(topk_sorted($"value", cap, distinct = true).as("t"))
        .head().getSeq[String](1)
      r shouldBe (0 until cap).map(i => f"s$i%07d")
      TopKSorted.observedPeak should be <= cap + 1 // transient pre-trim insert
      TopKSorted.observedPeak should be >= cap
    } finally TopKSorted.peakTracking = false
  }

  test("SQL surface: topk_sorted registered via GraftExtensions") {
    corpus.createOrReplaceTempView("tk_corpus")
    val got = spark.sql(
      """SELECT key, topk_sorted(value, 3, true) AS t
        |FROM tk_corpus GROUP BY key""".stripMargin)
    val want = corpus.groupBy($"key")
      .agg(slice(array_sort(collect_set($"value")), 1, 3).as("t"))
    got.join(want.withColumnRenamed("t", "w"), Seq("key"))
      .filter(!($"t" <=> $"w")).count() shouldBe 0L
  }

  test("bigint elements: agreement with slice(array_sort(collect_*)) + structural bound") {
    val longs = (0 until 3000).map(i => ("head", ((i * 37) % 700).toLong)) ++
      (0 until 100).flatMap(g => (0 to g % 5).map(j => (s"g$g", (j * 13 + g).toLong)))
    val df = longs.toDF("key", "value")
    TopKSorted.resetPeak()
    TopKSorted.peakTracking = true
    try {
      for (distinct <- Seq(true, false)) {
        val got = df.groupBy($"key")
          .agg(topk_sorted($"value", 9, distinct).as("t"))
        val want = df.groupBy($"key").agg(slice(array_sort(
          if (distinct) collect_set($"value") else collect_list($"value")), 1, 9).as("t"))
        got.join(want.withColumnRenamed("t", "w"), Seq("key"))
          .filter(!($"t" <=> $"w")).count() shouldBe 0L
      }
      TopKSorted.observedPeak should be <= 10 // cap + transient pre-trim insert
    } finally TopKSorted.peakTracking = false
  }

  test("binary elements: agreement with slice(array_sort(collect_*)) (unsigned byte order)") {
    // bytes above 0x7f exercise the UNSIGNED comparison (signed would
    // sort 0x80.. before 0x01..); prefix pairs exercise shorter-first
    val bins = (0 until 500).map { i =>
      val b = Array[Byte](((i * 131) % 256).toByte, ((i * 17) % 256).toByte)
      ("head", if (i % 11 == 0) b.take(1) else b)
    } ++ (0 until 40).map(g => (s"g${g % 7}", Array[Byte]((g % 256).toByte)))
    val df = bins.toDF("key", "value")
    for (distinct <- Seq(true, false)) {
      val got = df.groupBy($"key")
        .agg(topk_sorted($"value", 6, distinct).as("t"))
      val want = df.groupBy($"key").agg(slice(array_sort(
        if (distinct) collect_set($"value") else collect_list($"value")), 1, 6).as("t"))
      got.join(want.withColumnRenamed("t", "w"), Seq("key"))
        .filter(!($"t" <=> $"w")).count() shouldBe 0L
    }
  }

  test("unsupported element type fails analysis loudly (no unbounded fallback)") {
    val df = Seq(("a", 1.5), ("a", 2.5)).toDF("key", "value")
    val e = intercept[Exception] {
      df.groupBy($"key").agg(topk_sorted($"value", 3, distinct = true)).collect()
    }
    e.getMessage should include("topk_sorted")
  }

  test("serialize/deserialize round-trips the bounded buffer (spill path)") {
    val agg = TopKSorted(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "x", org.apache.spark.sql.types.StringType),
      4, distinct = false)
    val b = agg.createAggregationBuffer()
    Seq("d", "b", "c", "a", "b", "e").foreach(s =>
      b.insert(org.apache.spark.unsafe.types.UTF8String.fromString(s), 1L))
    val back = agg.deserialize(agg.serialize(b))
    agg.eval(back) shouldBe agg.eval(b)
    back.total shouldBe 4L
  }
}
