package graft.extract

import graft.model.{ExtractedPage, PageRow}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Stage 1: url-dedup + deterministic text extraction.
  *
  * ≙ reference passes 0/1 (index parse + source parse): dedup-by-key
  * (clangd_index_yaml_parser.py:256-258 "last wins" dict insert) followed
  * by a deterministic per-row extractor (compilation_parser.py:49-121).
  */
object Extract {

  /** Keep exactly one row per url: max (warc_ts, xxhash64(html)).
    * The html hash is a total-order tie-break so the winner is
    * deterministic under any parallelism (SURVEY.md §7.4). Implemented as
    * a single hash aggregate (map-side partial `max_by` — no sort, no
    * window function, one shuffle on url). */
  def dedupLatest(pages: Dataset[PageRow]): Dataset[PageRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.toDF()
      .groupBy($"url")
      .agg(max_by(
        struct($"url", $"warc_ts", $"html", $"text", $"lang"),
        struct($"warc_ts", xxhash64($"html"))).as("r"))
      .select($"r.*")
      .as[PageRow]
  }

  /** Host part of a url — the hierarchy's depth-1 node (≙ root folder,
    * clangd_symbol_nodes_builder.py:416-424). Shares the native
    * expression's EXACT scheme-strip + query/fragment-drop logic
    * (PathPrefixes.pathPart) so site(url) always equals
    * Hierarchy.prefixesOf(url)(0) — including messy urls
    * (`https://h?x=1` → "h") and non-ASCII pseudo-schemes. */
  def site(url: String): String =
    graft.functions.PathPrefixes.pathPart(url).takeWhile(_ != '/')

  /** Pure per-row extraction — a typed Dataset.map over a deterministic
    * Scala function; never a SQL UDF, never `asNondeterministic`.
    * The strategy is pluggable (TextExtractor, §2.9 analog). */
  def extractOne(p: PageRow, extractor: TextExtractor = HtmlTextExtractor): ExtractedPage = {
    val text = extractor.extractText(p.html)
    ExtractedPage(
      url = p.url,
      site = site(p.url),
      warc_ts = p.warc_ts,
      text = text,
      lang = p.lang,
      links = extractor.extractLinks(p.html),
      text_sha256 = HtmlText.sha256Hex(text),
      html_xxh64 = graft.util.Det.xxh64Bytes(p.html))
  }

  /** Version string of the persisted `extracted` stage: extractor
    * semantics + row schema. Column semantics live here: `+xxh64` added
    * the html_xxh64 column after extractor-v1 shipped; `+msgurl` froze
    * the messy-url site() policy (query/fragment dropped, ASCII-only
    * scheme strip) — `site` is a persisted column, so a partial build
    * committed under the old semantics must rebuild, not resume. */
  val StageVersion: String = HtmlText.VERSION + "+xxh64+msgurl"

  /** Version-adaptive strategy dispatch (P5) — ≙ the reference inspecting
    * the DATA, not configuration, to pick its parse strategy
    * (has_container_field / has_call_kind inference,
    * clangd_index_yaml_parser.py:276-281, feeding the extractor pick at
    * clangd_graph_rag_builder.py:160-168): sample a bounded prefix of the
    * corpus; if at least half the payloads carry html structure, use the
    * tag-aware extractor, else the plain-text fallback. One tiny
    * aggregate, same shape as Mention's maxLen inference. */
  def inferExtractor(pages: Dataset[PageRow], sampleSize: Int = 256): TextExtractor = {
    // deterministic sample: the `sampleSize` rows with the smallest
    // xxhash64(url) — a bare limit() would let partition layout decide
    // which rows arrive, so the strategy pick could flip between
    // otherwise-identical runs. orderBy+limit is TakeOrderedAndProject:
    // a per-partition top-K, no global sort.
    val r = pages.toDF()
      .orderBy(xxhash64(col("url")), col("url")).limit(sampleSize)
      .select(when(
        instr(lower(col("html").cast("string")), "<html") > 0 ||
          instr(lower(col("html").cast("string")), "<body") > 0,
        1L).otherwise(0L).as("is_html"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("is_html")), lit(0L)).as("h"))
      .head()
    if (r.getLong(0) == 0L || r.getLong(1) * 2 >= r.getLong(0)) HtmlTextExtractor
    else PlainTextExtractor
  }

  /** `run` with the data-inferred strategy. */
  def runAuto(pages: Dataset[PageRow]): Dataset[ExtractedPage] =
    run(pages, inferExtractor(pages))

  /** Hard cap on the driver-collected contested-winner table (urls with
    * more than one crawl row): ~4M entries ≈ a few hundred MB broadcast.
    * Crawl batches dedup within a capture window, so contested urls are
    * a small percentage of the batch; over the cap [[run]] falls back to
    * the wide-shuffle plan, which is correct at any scale. */
  val MaxContestedUrls: Int = 4 * 1000 * 1000

  /** Url-dedup + extraction with a KEY-WIDTH dedup pass (round-5 scaling
    * lever — the ~12 KB/row extracted-record shuffle was the cluster
    * scaling tail once extraction itself went scanner-fast):
    *
    *  1. Pass 1 shuffles only (url, warc_ts) multiplicities — ~30 bytes
    *     per row — and keeps just the CONTESTED urls (count > 1, ~2% of
    *     a crawl batch) with their winning timestamp. The html column is
    *     PRUNED out of this scan entirely (it is ~99% of the input
    *     bytes): the html hash only matters as a tie-break WITHIN a
    *     url's max warc_ts, so hashing every row up front — as the first
    *     cut of this plan did — re-read the whole corpus just to break
    *     ties that almost never happen.
    *  2. Pass 2 scans the input once, drops loser rows with a broadcast
    *     winner-timestamp probe (uncontested urls pass untouched), and
    *     extracts ONLY the winners map-side. The extracted rows never
    *     cross a shuffle; losers are never extracted at all (the old
    *     plan extracted them first and discarded them after the wide
    *     shuffle).
    *
    * The keep-latest tie-break is unchanged and shared: max (warc_ts,
    * xxhash64(html)) — the ONE frozen total-order key of dedupLatest and
    * Incremental.diff (Det.xxh64Bytes ≡ SQL xxhash64). A url with a
    * UNIQUE max warc_ts (the overwhelmingly common case) never consults
    * the hash leg of that key, so skipping the hash is semantics-free.
    * The rare url whose max warc_ts is held by SEVERAL rows (same-second
    * recrawls, byte-identical captures) is ESCALATED to the legacy
    * wide-shuffle plan on just its own rows — the full frozen key,
    * decided at the driver, so the common case plans no second branch at
    * all. A contested set over [[MaxContestedUrls]] (pathological batch)
    * also falls back to the wide plan rather than overfilling the driver.
    *
    * ≙ reference chunk-merge dedup (clangd_index_yaml_parser.py:355-372
    * "last wins" dict insert), re-shaped so the merge key is ~30 bytes
    * instead of the record. */
  def run(
      pages: Dataset[PageRow],
      extractor: TextExtractor = HtmlTextExtractor): Dataset[ExtractedPage] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val contested = contestedUrls(pages).take(MaxContestedUrls + 1)
    if (contested.length > MaxContestedUrls) return runWideShuffle(pages, extractor)

    // url → (winning warc_ts, escalated: max-ts row not unique)
    val winners = new java.util.HashMap[String, (java.sql.Timestamp, Boolean)](
      contested.length * 2 + 16)
    contested.foreach(r =>
      winners.put(r.getString(0), (r.getTimestamp(1), r.getLong(2) > 1L)))
    val winnersB = spark.sparkContext.broadcast(winners)
    val main = pages
      .filter { p =>
        val w = winnersB.value.get(p.url)
        w == null || (!w._2 && w._1.equals(p.warc_ts))
      }
      .map(p => extractOne(p, extractor))
    val escalated = contested.filter(_.getLong(2) > 1L).map(_.getString(0)).toSet
    if (escalated.isEmpty) main
    else { // max-ts ties (needs the html-hash leg of the frozen key):
           // only THEIR rows take the legacy wide plan
      val escB = spark.sparkContext.broadcast(escalated)
      main.union(
        runWideShuffle(pages.filter(p => escB.value.contains(p.url)), extractor))
    }
  }

  /** Pass 1 of [[run]]: per-url (winning warc_ts, its multiplicity) for
    * urls with more than one crawl row — columns (url, warc_ts, c).
    * Shuffles only (url, warc_ts) multiplicities; the html column is
    * pruned out of the scan (plan-asserted in ExtractDedupSpec — this
    * pruning, not the narrow shuffle alone, is what makes pass 1 nearly
    * free: html is ~99% of the input bytes). */
  private[graft] def contestedUrls(pages: Dataset[PageRow]) = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.toDF()
      .select($"url", $"warc_ts")
      .groupBy($"url", $"warc_ts").agg(count(lit(1)).as("c"))
      .groupBy($"url")
      .agg(sum($"c").as("n"),
        max_by(struct($"warc_ts", $"c"), $"warc_ts").as("w"))
      .filter($"n" > 1)
      .select($"url", $"w.warc_ts", $"w.c")
  }

  /** The pre-round-5 plan: extract every row map-side, then one wide
    * shuffle of the full extracted records with a `max_by` hash
    * aggregate. Correct at any contested-set size (nothing driver-side);
    * kept as the fallback for [[run]]'s capped paths and as the
    * agreement reference in ExtractDedupSpec. */
  private[graft] def runWideShuffle(
      pages: Dataset[PageRow],
      extractor: TextExtractor = HtmlTextExtractor): Dataset[ExtractedPage] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val ex = pages.map(p => extractOne(p, extractor))
    ex.groupBy($"url")
      .agg(max_by(struct(ex.columns.map(col): _*),
        struct($"warc_ts", $"html_xxh64")).as("r"))
      .select($"r.*")
      .as[ExtractedPage]
  }
}
