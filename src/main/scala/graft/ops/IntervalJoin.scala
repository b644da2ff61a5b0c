package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Interval containment join with the reference's first-match semantics
  * (reference: clangd_call_graph_builder.py:124-201, J4 in SURVEY.md §2.3
  * — per-file body index sorted by start, linear probe, break at FIRST
  * containing interval).
  *
  * Shape: equi key (file/user/...) + range containment. A naive
  * `a.join(b, key && lo <= p && p <= hi)` is O(n·m) per key and cannot
  * express "first match wins" without a second window pass; this
  * operator cogroup-sorts intervals per key once and binary-searches —
  * exactly the reference's spatial index, distributed by key. Skew note:
  * group size is bounded by per-key interval counts (files/users), and
  * the sorted-array probe is O(log m) per point.
  */
object IntervalJoin {

  final case class Point(key: Long, p: Double, pid: Long)
  final case class Interval(key: Long, lo: Double, hi: Double, iid: Long)
  final case class Match(pid: Long, iid: Long, key: Long)

  /** For each point, the FIRST containing interval — first by (lo, iid)
    * order, reproducing the reference's sort-by-start + first-hit-break
    * tie-break for nested intervals. Points with no container dropped
    * (inner-join semantics). */
  def firstMatch(points: Dataset[Point], intervals: Dataset[Interval]): Dataset[Match] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.groupByKey(_.key).cogroup(intervals.groupByKey(_.key)) {
      (key, ps, is) =>
        // IntervalIndex = (lo, iid)-sorted candidates, first hit wins —
        // the reference's scan semantics, answered in O(log m)
        val idx = IntervalIndex.build(is.map(i => (i.lo, i.hi, i.iid)).toArray)
        if (idx.size == 0) Iterator.empty
        else ps.flatMap { pt =>
          val j = idx.firstMatch(pt.p)
          if (j < 0) None else Some(Match(pt.pid, idx.iidAt(j), key))
        }
    }
  }

  /** Custom-plan path (requires a session built with GraftExtensions):
    * plans graft.plans.IntervalFirstMatch — same semantics as
    * `firstMatch`, but staying on InternalRow end-to-end with no encoder
    * boundary. Output columns (pid, iid, key). */
  def firstMatchPlanned(
      points: Dataset[Point], intervals: Dataset[Interval]): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.ofRows(points.sparkSession,
      graft.plans.IntervalFirstMatch(
        GraftSqlBridge.logicalPlan(points.toDF()),
        GraftSqlBridge.logicalPlan(intervals.toDF())))
  }

  /** The planned path when the strategy is injected, else the cogroup
    * fallback — callers get the best available operator either way. */
  def firstMatchAuto(
      points: Dataset[Point], intervals: Dataset[Interval]): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    if (GraftSqlBridge.hasStrategy(points.sparkSession,
        classOf[graft.plans.IntervalFirstMatchStrategy]))
      firstMatchPlanned(points, intervals)
    else firstMatch(points, intervals).toDF()
  }

  /** The declarative equivalent (join + min_by window) — used as the
    * cross-check oracle shape; O(candidates) not O(points). */
  def firstMatchSql(points: DataFrame, intervals: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    points.as("p").join(intervals.as("i"),
        col("p.key") === col("i.key") &&
          col("i.lo") <= col("p.p") && col("p.p") <= col("i.hi"))
      .groupBy(col("p.pid").as("pid"))
      .agg(min_by(struct(col("i.iid"), col("p.key").as("key")),
        struct(col("i.lo"), col("i.iid"))).as("w"))
      .select(col("pid"), col("w.iid").as("iid"), col("w.key").as("key"))
  }
}
