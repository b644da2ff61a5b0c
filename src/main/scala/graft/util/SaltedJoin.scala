package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit salted-key skew handling (north_rule: "salted-key handling
  * for head-entity skew"; reference analog: the group-by-file deadlock
  * isolation knob, clangd_symbol_nodes_builder.py:259-307, whose Spark
  * translation is shuffle-skew management, SURVEY.md §4).
  *
  * AQE's skew-join rule only splits SORT-MERGE join partitions; a
  * deliberately skewed key (one entity on 20%+ of rows) on a
  * non-broadcastable build side still hot-spots one task. Salting fixes
  * it structurally: the skewed (probe) side gets a deterministic salt in
  * [0, S) derived from a high-cardinality column it already carries; the
  * small(er) build side is replicated S times. The join key becomes
  * (key, salt) → the hot key spreads over S tasks.
  */
object SaltedJoin {

  /** Inner-join `skewed` with `dim` on `key`, spreading each key over
    * `salt` shuffle partitions.
    *
    * @param saltSource a column of `skewed` with high cardinality
    *                   (e.g. url) — salt = pmod(xxhash64(saltSource), S),
    *                   deterministic under any parallelism. */
  def inner(
      skewed: DataFrame,
      dim: DataFrame,
      key: String,
      saltSource: Column,
      salt: Int = 32): DataFrame = {
    require(salt > 0)
    val saltCol = "__graft_salt"
    val l = skewed.withColumn(saltCol, pmod(xxhash64(saltSource), lit(salt)))
    val r = dim.withColumn(
      saltCol, explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    l.join(r, Seq(key, saltCol), "inner").drop(saltCol)
  }

  /** Two-phase salted aggregation: count rows per `key` where one key may
    * dominate. Phase 1 pre-aggregates on (key, salt); phase 2 sums.
    * (For plain count Spark's partial aggregation already combines
    * map-side; this utility is for aggregates downstream of a join or
    * after an exchange where partials no longer help.) */
  def saltedCount(
      df: DataFrame,
      key: String,
      saltSource: Column,
      salt: Int = 32): DataFrame = {
    val saltCol = "__graft_salt"
    df.withColumn(saltCol, pmod(xxhash64(saltSource), lit(salt)))
      .groupBy(col(key), col(saltCol)).count()
      .groupBy(col(key)).agg(sum("count").as("count"))
  }
}
