package graft.plans

import graft.SparkSpec
import graft.ops.IntervalJoin
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.SparkPlan

/** The custom Catalyst tier (IntervalFirstMatch LogicalPlan + injected
  * Strategy + Exec) against the typed-cogroup operator it replaces:
  * identical semantics on ties/nesting/empty keys, invariant under
  * repartitioning, and the intended physical shape (our Exec + exactly
  * one exchange per side — the ShuffledHashJoin shape, no encoder
  * boundary). */
class IntervalFirstMatchPlanSpec extends SparkSpec {
  import spark.implicits._

  private def pts(n: Int) = (0 until n).map(i =>
    IntervalJoin.Point((i % 7).toLong, (i * 13 % 97).toDouble, i.toLong))
  private def ivs(n: Int) = (0 until n).map(i =>
    IntervalJoin.Interval((i % 7).toLong, (i * 7 % 50).toDouble,
      (i * 7 % 50 + i % 13).toDouble, i.toLong))

  private def executed(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] = {
    df.collect() // materialize so AQE finalizes the plan
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE hides work behind leaf QueryStageExec nodes (incl. Spark 4's
    // result stage) — flatten through them so collect-style asserts see
    // the real operators
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
        case _ => p.children
      }
      p +: kids.flatMap(flatten)
    }
    flatten(root)
  }

  test("strategy is injected via GraftExtensions and plans our Exec") {
    assert(GraftSqlBridge.hasStrategy(spark, classOf[IntervalFirstMatchStrategy]))
    val df = IntervalJoin.firstMatchPlanned(
      pts(100).toDS(), ivs(40).toDS())
    val nodes = executed(df)
    assert(nodes.count(_.isInstanceOf[IntervalFirstMatchExec]) == 1,
      s"expected IntervalFirstMatchExec in:\n${nodes.head}")
    // one exchange per side — the co-partitioned shuffle shape
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) == 2,
      s"expected exactly 2 exchanges in:\n${nodes.head}")
  }

  test("firstMatchAuto picks the planned path in an extension session") {
    val df = IntervalJoin.firstMatchAuto(pts(50).toDS(), ivs(20).toDS())
    assert(executed(df).exists(_.isInstanceOf[IntervalFirstMatchExec]))
  }

  test("tie-break: same-start intervals resolve by lowest iid, nested by start") {
    val p = Seq(
      IntervalJoin.Point(1L, 5.0, 100L),
      IntervalJoin.Point(1L, 15.0, 101L),
      IntervalJoin.Point(2L, 5.0, 102L), // key with no intervals
      IntervalJoin.Point(1L, 50.0, 103L) // contained by nothing
    ).toDS()
    val i = Seq(
      IntervalJoin.Interval(1L, 0.0, 10.0, 7L),
      IntervalJoin.Interval(1L, 2.0, 30.0, 5L), // nested: starts later
      IntervalJoin.Interval(1L, 0.0, 10.0, 3L) // same start as 7, lower id
    ).toDS()
    val r = IntervalJoin.firstMatchPlanned(p, i)
      .as[IntervalJoin.Match].collect().sortBy(_.pid)
    assert(r.toSeq == Seq(
      IntervalJoin.Match(100L, 3L, 1L), // same-start tie → lower iid
      IntervalJoin.Match(101L, 5L, 1L))) // only the nested one contains 15
  }

  test("agreement with cogroup and SQL paths across repartitionings") {
    val basePts = pts(400).toDS()
    val baseIvs = ivs(150).toDS()
    val expect = IntervalJoin.firstMatch(basePts, baseIvs)
      .collect().map(m => (m.pid, m.iid, m.key)).sorted.toSeq
    assert(expect.nonEmpty)
    val sql = IntervalJoin.firstMatchSql(basePts.toDF(), baseIvs.toDF())
      .as[IntervalJoin.Match].collect().map(m => (m.pid, m.iid, m.key)).sorted.toSeq
    assert(sql == expect)
    for ((np, ni) <- Seq((1, 1), (7, 3), (11, 2))) {
      val got = IntervalJoin.firstMatchPlanned(
          basePts.repartition(np), baseIvs.repartition(ni))
        .as[IntervalJoin.Match].collect().map(m => (m.pid, m.iid, m.key)).sorted.toSeq
      assert(got == expect, s"planned path diverged at repartition($np,$ni)")
    }
  }

  test("empty sides") {
    val e = Seq.empty[IntervalJoin.Interval].toDS()
    assert(IntervalJoin.firstMatchPlanned(pts(10).toDS(), e).count() == 0L)
    assert(IntervalJoin.firstMatchPlanned(
      Seq.empty[IntervalJoin.Point].toDS(), ivs(10).toDS()).count() == 0L)
  }
}
