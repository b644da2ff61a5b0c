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
    *  1. Pass 1 shuffles only (url, warc_ts, xxhash64(html)) — ~40 bytes
    *     per row — and keeps just the CONTESTED urls (count > 1, ~2% of
    *     a crawl batch) with their winning key. Two-level aggregate, so
    *     the per-url `max_by` key is unique and the pick deterministic.
    *  2. Pass 2 re-scans the input, drops loser rows with a broadcast
    *     winner-key probe (uncontested urls pass untouched — no lookup
    *     miss cost beyond a hash probe), and extracts ONLY the winners
    *     map-side. The extracted rows never cross a shuffle; losers are
    *     never extracted at all (the old plan extracted them first and
    *     discarded them after the wide shuffle).
    *
    * The keep-latest tie-break is unchanged and shared: max (warc_ts,
    * xxhash64(html)) — the ONE frozen total-order key of dedupLatest and
    * Incremental.diff (Det.xxh64Bytes ≡ SQL xxhash64). The rare url whose
    * winning key is held by SEVERAL rows (byte-identical captures) is
    * routed to the legacy wide-shuffle plan — decided at the driver, so
    * the common case plans no second branch at all. A contested set over
    * [[MaxContestedUrls]] (pathological batch) also falls back to the
    * wide plan rather than overfilling the driver.
    *
    * ≙ reference chunk-merge dedup (clangd_index_yaml_parser.py:355-372
    * "last wins" dict insert), re-shaped so the merge key is 40 bytes
    * instead of the record. */
  def run(
      pages: Dataset[PageRow],
      extractor: TextExtractor = HtmlTextExtractor): Dataset[ExtractedPage] = {
    val spark = pages.sparkSession
    import spark.implicits._
    // pass 1 (narrow shuffle): exact-key multiplicities, then per-url
    // winner + the winner's multiplicity; contested urls only
    val keyCounts = pages.toDF()
      .select($"url", $"warc_ts", xxhash64($"html").as("h"))
      .groupBy($"url", $"warc_ts", $"h").agg(count(lit(1)).as("c"))
    val contested = keyCounts.groupBy($"url")
      .agg(sum($"c").as("n"),
        max_by(struct($"warc_ts", $"h", $"c"), struct($"warc_ts", $"h")).as("w"))
      .filter($"n" > 1)
      .select($"url", $"w.warc_ts", $"w.h", $"w.c")
      .take(MaxContestedUrls + 1)
    if (contested.length > MaxContestedUrls) return runWideShuffle(pages, extractor)

    // url → (winning warc_ts, winning html hash, winner-key tie?)
    val winners = new java.util.HashMap[String, (java.sql.Timestamp, Long, Boolean)](
      contested.length * 2 + 16)
    contested.foreach(r =>
      winners.put(r.getString(0), (r.getTimestamp(1), r.getLong(2), r.getLong(3) > 1L)))
    val winnersB = spark.sparkContext.broadcast(winners)
    val main = pages
      .filter { p =>
        val w = winnersB.value.get(p.url)
        w == null ||
          (!w._3 && w._1.equals(p.warc_ts) && w._2 == graft.util.Det.xxh64Bytes(p.html))
      }
      .map(p => extractOne(p, extractor))
    val tied = contested.filter(_.getLong(3) > 1L).map(_.getString(0)).toSet
    if (tied.isEmpty) main
    else { // byte-identical duplicate captures: only THEIR rows take the
           // legacy wide plan (filter keeps >1 row per such url)
      val tiedB = spark.sparkContext.broadcast(tied)
      main.union(
        runWideShuffle(pages.filter(p => tiedB.value.contains(p.url)), extractor))
    }
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
