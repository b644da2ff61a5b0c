package graft.mention

import java.util.Locale

import graft.model.{AliasRow, CandidateRow, ExtractedPage}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Stage 2: mention detection + candidate generation.
  *
  * Spec (frozen — the golden oracle depends on it):
  *  - tokens(text) = text.toLowerCase(ROOT).split("[^a-z0-9]+"), empties
  *    dropped;
  *  - every token n-gram of length 1..maxAliasTokens whose space-joined
  *    surface equals a dictionary alias is a mention; overlaps between
  *    mentions are allowed (each match stands alone);
  *  - a mention has one candidate row per dictionary entry of its alias.
  *
  * Execution shape (north_star: "candidate generation via a broadcast
  * alias dictionary"): n-gram explode feeds a BroadcastHashJoin — the
  * probe is map-side, pipelined inside whole-stage codegen, no shuffle of
  * the big side. ≙ reference span-lookup probe (function_span_provider
  * .py:35-82), where the spans dict is the broadcast side.
  */
object Mention {

  def tokenize(text: String): Array[String] =
    text.toLowerCase(Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty)

  def aliasTokenCount(alias: String): Int = tokenize(alias).length

  def detect(
      extracted: Dataset[ExtractedPage],
      dict: Dataset[AliasRow]): Dataset[CandidateRow] = {
    val spark = extracted.sparkSession
    import spark.implicits._

    // Longest alias in the dictionary bounds n-gram generation. Tiny
    // one-row aggregate, same shape as the reference's schema-version
    // inference (clangd_index_yaml_parser.py:276-281).
    // ONE dictionary-sized collect feeds both inferences (two separate
    // jobs previously — visible fixed cost at small-corpus latencies):
    //  - maxLen: longest alias bounds n-gram generation (tiny aggregate,
    //    same shape as the reference's schema-version inference,
    //    clangd_index_yaml_parser.py:276-281); empty dict → no candidates;
    //  - firstTokens scale guard: a page with T tokens would otherwise
    //    materialize T*maxLen n-gram strings (60 GB+ of garbage per 10^8
    //    pages). An n-gram can only match if its FIRST token starts some
    //    alias, so a broadcast first-token set prunes start positions
    //    before any string is built. Semantics unchanged.
    val dictStats = dict
      .map(a => (aliasTokenCount(a.alias), tokenize(a.alias).headOption.getOrElse("")))
      .collect()
    if (dictStats.isEmpty) return spark.emptyDataset[CandidateRow]
    val maxLen = dictStats.iterator.map(_._1).max
    if (maxLen == 0) return spark.emptyDataset[CandidateRow]
    val firstTokensB = spark.sparkContext.broadcast(dictStats.iterator.map(_._2).toSet)

    // project to (url, text) BEFORE the typed boundary: the object
    // deserializer otherwise rebuilds the full ExtractedPage (links
    // array, hashes, …) per row just to read two fields
    val grams = extracted.select($"url", $"text").as[(String, String)]
      .flatMap { case (url, text) =>
        val toks = tokenize(text)
        val ft = firstTokensB.value
        Iterator.range(0, toks.length)
          .filter(s => ft.contains(toks(s)))
          .flatMap { s =>
            Iterator.range(1, maxLen + 1)
              .filter(l => s + l <= toks.length)
              .map(l => (url, s, l, toks.slice(s, s + l).mkString(" ")))
          }
      }.toDF("url", "tok_start", "tok_len", "surface")

    grams
      .join(broadcast(dict.toDF()), $"surface" === $"alias", "inner")
      .select($"url", $"tok_start", $"tok_len", $"alias", $"entity_id", $"prior")
      .as[CandidateRow]
  }
}
