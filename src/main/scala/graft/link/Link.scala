package graft.link

import graft.model.{CandidateRow, LinkedMention}
import graft.util.SaltedJoin
import org.apache.spark.sql.{DataFrame, Dataset}
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
  * by LOWEST entity_id (FIXTURES.md §2.2) — order-insensitive under any
  * partitioning (SURVEY.md §7.4 determinism).
  *
  * Execution shape (one shuffle of the candidate stream): the alias
  * document-frequency table is dictionary-sized (bounded by the alias
  * dict that was already broadcast in Mention), so it is aggregated with
  * salting, collected and broadcast as a map; support and the per-mention
  * argmax are both url-local, so a single groupByKey(url) computes them
  * in one pass per page. The previous DataFrame shape shuffled the
  * candidate stream three times (support agg, support join, argmax agg).
  */
object Link {

  /** Per-alias document frequency: #distinct urls containing the alias.
    * Output is dictionary-sized. The head alias appears on 20%+ of pages —
    * the salted two-phase aggregate keeps that key off a single reducer. */
  def aliasDf(cands: DataFrame): DataFrame =
    SaltedJoin
      .saltedCount(cands.select(col("url"), col("alias")).distinct(), "alias", col("url"))
      .withColumnRenamed("count", "alias_df")

  /** Collect a (alias, alias_df) table to the driver map `resolve`
    * broadcasts — dictionary-sized by construction. */
  def collectAliasDf(dfTable: DataFrame): Map[String, Long] =
    dfTable.select(col("alias"), col("alias_df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** @param precomputedDf optional global alias→df map to use instead of
    *        deriving df from `cands` — the staged build passes the
    *        aliasdf-stage sum and the incremental updater the maintained
    *        global df, so dirty-bucket relinks score against corpus-wide
    *        document frequencies, not dirty-scope ones (incremental ≡
    *        full-rebuild contract). Must cover every alias present in
    *        `cands`; a miss fails the job loudly (it means a stale
    *        aliasdf snapshot, e.g. the dictionary changed under an
    *        unchanged snapshot id). */
  def resolve(
      cands: Dataset[CandidateRow],
      nPages: Long,
      precomputedDf: Option[Map[String, Long]] = None): Dataset[LinkedMention] = {
    val spark = cands.sparkSession
    import spark.implicits._

    val dfMap: Map[String, Long] =
      precomputedDf.getOrElse(collectAliasDf(aliasDf(cands.toDF())))
    val dfB = spark.sparkContext.broadcast(dfMap)
    val n = nPages.toDouble

    cands.groupByKey(_.url).flatMapGroups { (url, it) =>
      val rows = it.toArray
      val m = dfB.value
      // per-page entity support
      val support = new scala.collection.mutable.HashMap[Long, Int]()
      rows.foreach(c => support.update(c.entity_id,
        support.getOrElse(c.entity_id, 0) + 1))
      // per-mention argmax (score, then lowest entity_id) — same total
      // order as max_by(struct(score, -entity_id))
      rows.groupBy(c => (c.tok_start, c.tok_len)).iterator.map {
        case ((s, l), cs) =>
          var best: CandidateRow = null
          var bestScore = Double.NegativeInfinity
          cs.foreach { c =>
            val df = m.getOrElse(c.alias, throw new IllegalStateException(
              s"alias '${c.alias}' missing from the alias-df table — " +
                "stale aliasdf snapshot? (dictionary changed under an " +
                "unchanged snapshot id)"))
            val sc = c.prior * math.log(1.0 + n / df) +
              0.01 * support(c.entity_id)
            if (best == null || sc > bestScore ||
              (sc == bestScore && c.entity_id < best.entity_id)) {
              best = c; bestScore = sc
            }
          }
          LinkedMention(url, s, l, best.alias, best.entity_id, bestScore)
      }
    }
  }
}
