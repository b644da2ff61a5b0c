package graft.link

import graft.model.{CandidateRow, LinkedMention}
import graft.util.SaltedJoin
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Stage 3: entity-link scoring + per-mention argmax.
  *
  * ≙ reference call extraction: version-adaptive predicate + container
  * join picks *the* caller for each ref (clangd_call_graph_builder.py:
  * 203-227); here a deterministic score picks *the* entity per mention.
  *
  * Score spec (frozen):
  *   idf(alias)          = ln(1 + nPages / df(alias)),
  *                         df = #distinct urls containing the alias
  *   support(url,entity) = #candidate rows on that url for that entity
  *   score = prior * idf(alias) + 0.01 * support(url, entity)
  * Winner per mention (url, tok_start, tok_len): max score, ties broken
  * by LOWEST entity_id (FIXTURES.md §2.2) — implemented as a single
  * max_by on struct(score, -entity_id), order-insensitive under any
  * partitioning (SURVEY.md §7.4 determinism).
  */
object Link {

  def resolve(cands: Dataset[CandidateRow], nPages: Long): Dataset[LinkedMention] = {
    val spark = cands.sparkSession
    import spark.implicits._
    val c = cands.toDF()

    // Alias document frequency. The head alias appears on 20%+ of pages —
    // the salted two-phase aggregate keeps that key off a single reducer.
    val df = SaltedJoin
      .saltedCount(c.select($"url", $"alias").distinct(), "alias", $"url")
      .withColumnRenamed("count", "alias_df")

    // Per-page entity support (url spreads the key space; no salt needed).
    val support = c.groupBy($"url", $"entity_id")
      .agg(count(lit(1)).as("support"))

    val scored = c
      .join(broadcast(df), "alias") // dictionary-sized: broadcast
      .join(support, Seq("url", "entity_id"))
      .withColumn("score",
        $"prior" * log(lit(1.0) + lit(nPages.toDouble) / $"alias_df") +
          lit(0.01) * $"support")

    scored
      .groupBy($"url", $"tok_start", $"tok_len")
      .agg(max_by(
        struct($"alias", $"entity_id", $"score"),
        struct($"score", -$"entity_id")).as("w"))
      .select($"url", $"tok_start", $"tok_len",
        $"w.alias".as("alias"), $"w.entity_id".as("entity_id"),
        $"w.score".as("score"))
      .as[LinkedMention]
  }
}
