package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph queries on edge tables (reference: transitive INCLUDES
  * closure, include_relation_provider.py:69-133 / J11-J12; iterative
  * folder prune A9). Catalyst has no recursion — these are driver-side
  * fixpoint loops of self-joins with lineage truncation, the same
  * skeleton as canon.ConnectedComponents.
  *
  * Cost discipline (the fixed overhead dominates at fixture scale and
  * the per-round shuffles dominate at 100×): every round runs exactly ONE
  * Spark job — intermediates are lazily localCheckpoint'ed and the loop-
  * condition action materializes the whole round's chain; the cumulative
  * result set is deduplicated once at the END, not per round.
  */
object GraphOps {

  /** All nodes reachable FROM the seed set following src→dst edges
    * (seeds excluded unless reachable via a cycle). Frontier-based BFS:
    * each round joins only the NEW frontier against the edge table. */
  def reachable(
      edges: DataFrame, seeds: DataFrame, maxIter: Int = 100,
      driverThreshold: Long = 1L << 20): DataFrame = {
    val spark = edges.sparkSession
    // Fast path: a graph that fits the driver (take answers "does it
    // fit" and fetches it in one job) pays one collect instead of
    // O(depth) Spark jobs — the distributed fixpoint below serves
    // genuinely large graphs. Same pattern as canonMap's union-find.
    val takenE = edges.select(col("src"), col("dst"))
      .take((driverThreshold + 1).toInt)
    if (takenE.length <= driverThreshold) {
      import spark.implicits._
      val adj = takenE.iterator.map(r => (r.get(0), r.get(1)))
        .toSeq.distinct.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
      val seedSet = seeds.select(col("node")).distinct().collect()
        .map(_.get(0)).toSet
      val reached = scala.collection.mutable.Set.empty[Any]
      var frontier = seedSet
      var visited = seedSet
      var i = 0
      while (frontier.nonEmpty && i < maxIter) {
        val step = frontier.iterator
          .flatMap(n => adj.getOrElse(n, Nil)).toSet
        reached ++= step
        frontier = step diff visited
        visited = visited ++ frontier
        i += 1
      }
      // converged ⇔ the frontier drained; i == maxIter with an empty
      // frontier is a legitimate exact-depth convergence
      require(frontier.isEmpty, s"reachability did not converge in $maxIter rounds")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "node", edges.schema("dst").dataType, nullable = true)))
      return spark.createDataFrame(
        spark.sparkContext.parallelize(
          reached.iterator.map(v => org.apache.spark.sql.Row(v)).toSeq,
          numSlices = 1),
        schema)
    }
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    var visited = seeds.select(col("node")).distinct().localCheckpoint()
    var steps: List[DataFrame] = Nil // per-round reached sets (lazily checkpointed)
    var frontier = visited
    var i = 0
    while (!frontier.isEmpty && i < maxIter) {
      // one action per round: next round's isEmpty materializes this chain
      val step = e.join(frontier, e("src") === frontier("node"))
        .select(e("dst").as("node")).distinct().localCheckpoint(false)
      val next = step.join(visited, Seq("node"), "left_anti").localCheckpoint(false)
      visited = visited.union(next).localCheckpoint(false)
      steps ::= step
      frontier = next
      i += 1
    }
    // frontier is localCheckpoint'ed — this isEmpty re-check is one cheap
    // action, and unlike `i < maxIter` it cannot fire on exact-depth
    // convergence
    require(frontier.isEmpty, s"reachability did not converge in $maxIter rounds")
    // global dedup deferred to one pass over the (materialized) steps
    steps.reduceOption(_ union _).map(_.distinct()).getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        visited.schema))
  }

  /** Iterative empty-parent pruning (A9 analog): repeatedly drop nodes
    * with no outgoing edge into the surviving set, to fixpoint. */
  def pruneLeafless(
      nodes: DataFrame, // (node)
      edges: DataFrame, // (src, dst) — "contains" style
      keep: DataFrame, // (node) leaves that justify their ancestors
      maxIter: Int = 100): DataFrame = {
    var surviving = nodes.select(col("node")).distinct().localCheckpoint()
    var prevCount = surviving.count()
    var changed = true
    var i = 0
    while (changed && i < maxIter) {
      val justified = edges
        .join(surviving.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .select(col("src").as("node")).distinct()
        .union(keep.select(col("node")))
        .distinct()
      val next = surviving.join(justified, Seq("node"), "left_semi")
        .localCheckpoint(false)
      val c = next.count() // the round's single action
      changed = c != prevCount
      prevCount = c
      surviving = next
      i += 1
    }
    surviving
  }
}
