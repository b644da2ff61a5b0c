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

  /** Hard cap on the broadcast alias dictionary (rows). ~8M rows ≈
    * a few hundred MB broadcast + driver stats — comfortably inside one
    * executor; real entity dictionaries (Wikidata labels ~100M surface
    * forms pruned to linkable heads) land well under this. Over the cap,
    * [[detect]] fails with an actionable error instead of an opaque OOM
    * (the contract is a broadcast-dictionary design, SURVEY.md §2 J2). */
  val MaxDictRows: Int = 8 * 1000 * 1000

  /** Frozen tokenizer, scanner form: maximal runs of [a-z0-9] from the
    * Locale.ROOT-lowercased text. Exactly ≡ [[tokenizeRef]] for EVERY
    * input — the split class is a pure ASCII set, so a direct char test
    * on the same lowercased string cannot disagree with the regex
    * (lowercasing itself stays `String.toLowerCase`: char-by-char
    * Character.toLowerCase would diverge on one-to-many mappings like
    * İ → i+U+0307). The regex form is retained below as the spec
    * reference and fuzz-compared — same discipline as the extraction
    * scanners. Scanner because this runs once per PAGE over ~20 KB of
    * text (ClusterPhaseBench: mention detection costs as much as
    * extraction) and per alias row. */
  def tokenize(text: String): Array[String] = {
    val lower = text.toLowerCase(Locale.ROOT)
    val n = lower.length
    val out = new scala.collection.mutable.ArrayBuffer[String](n / 6 + 4)
    var i = 0
    while (i < n) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        i += 1
        while (i < n && {
          val d = lower.charAt(i)
          (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        out += lower.substring(start, i)
      } else i += 1
    }
    out.toArray
  }

  /** The frozen-spec reference tokenizer (fuzz-pinned in
    * MentionLinkSpec; [[tokenize]] must agree on every input). */
  private[graft] def tokenizeRef(text: String): Array[String] =
    text.toLowerCase(Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty)

  def aliasTokenCount(alias: String): Int = tokenize(alias).length

  def detect(
      extracted: Dataset[ExtractedPage],
      dict: Dataset[AliasRow],
      maxDictRows: Int = MaxDictRows): Dataset[CandidateRow] = {
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
    // take(cap+1), not collect(): the over-cap case must fail with a
    // diagnosis BEFORE materializing a 100-GB dictionary on the driver
    val dictStats = dict
      .map(a => (aliasTokenCount(a.alias), tokenize(a.alias).headOption.getOrElse("")))
      .take(maxDictRows + 1)
    if (dictStats.length > maxDictRows)
      throw new IllegalStateException(
        s"alias dictionary exceeds Mention.MaxDictRows = $maxDictRows rows. " +
          "The linking contract (SURVEY.md §2 J2 / north_star) is a " +
          "BROADCAST dictionary: every executor holds it whole and the " +
          "driver collects per-alias stats. A dictionary this size needs " +
          "the shuffle-join variant instead — partition aliases by first " +
          "token and sort-merge against the n-gram stream — not a silent " +
          "driver/executor OOM here.")
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
            // surfaces grow incrementally: surface(l) = surface(l-1) +
            // " " + next token (identical strings to the slice+mkString
            // shape, without re-joining the prefix per length)
            val maxL = math.min(maxLen, toks.length - s)
            val sb = new java.lang.StringBuilder(toks(s))
            Iterator.range(1, maxL + 1).map { l =>
              if (l > 1) sb.append(' ').append(toks(s + l - 1))
              (url, s, l, sb.toString)
            }
          }
      }.toDF("url", "tok_start", "tok_len", "surface")

    grams
      .join(broadcast(dict.toDF()), $"surface" === $"alias", "inner")
      .select($"url", $"tok_start", $"tok_len", $"alias", $"entity_id", $"prior")
      .as[CandidateRow]
  }
}
