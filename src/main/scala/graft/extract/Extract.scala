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

  /** Extract FIRST (pure map over input splits — the html payload never
    * crosses a shuffle), then url-dedup on the much smaller extracted
    * rows. Duplicate urls are ~2% of a crawl, so the surplus extraction
    * is cheap; shuffling multi-KB html bodies is not. Keep-latest
    * tie-break: max (warc_ts, xxhash64(html)) — the ONE frozen total-order
    * key, shared with dedupLatest and Incremental.diff (an 8-byte hash
    * rides the shuffle instead of the html body). */
  def run(
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
