package graft.canon

import graft.model.{CanonRow, SameAsEdge}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stage 4: canonicalization — connected components over same-as edges,
  * canonical id = min entity id per component.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — converges
  * in O(log n) rounds vs O(diameter) for naive label propagation, and
  * both star operations are plain groupBy+join (no collect_list of a
  * whole neighborhood, so a skewed star component — FIXTURES.md §2.3 —
  * never materializes one giant array).
  *
  * ≙ reference transitive-closure fixpoint (include_relation_provider.py:
  * 80-133) and iterative folder prune (neo4j_manager.py:144-158): a
  * driver loop of self-joins with lineage truncation via localCheckpoint
  * every iteration (SURVEY.md §4 "Iterative fixpoint").
  */
object ConnectedComponents {

  /** large-star: connect every neighbor v > u to min({u} ∪ N(u)).
    *
    * The explicit repartition on u (round 6, guide §2.4) gives the
    * min-aggregate AND the join the same single exchange: both
    * consumers' required distribution is satisfied by it, and
    * ReuseExchange executes the nbrs subtree once — the previous shape
    * planned two separate exchanges of the same stream (agg side, join
    * side), each re-evaluating the union. */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbrs = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u"))
    val mins = nbrs.groupBy("u").agg(min("v").as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    nbrs.filter(col("v") > col("u"))
      .join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** small-star: point all smaller-or-equal neighbors (and u) to the min.
    * Same one-exchange repartition-reuse shape as [[largeStar]]. */
  private def smallStar(e: DataFrame): DataFrame = {
    val nbrs = e.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .repartition(col("u"))
    val mins = nbrs.groupBy("u").agg(min("v").as("m"))
    nbrs.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Fixpoint loop over (large-star; small-star). Convergence detected by
    * an order-insensitive checksum (count + xor of row hashes) — one
    * cheap aggregate per round instead of an `except` join. The round's
    * localCheckpoint is LAZY and the checksum is its materializing
    * action, so each round runs exactly one Spark job (round-1 ran two:
    * eager checkpoint + checksum).
    *
    * Round partitioning is SCALE-ADAPTIVE (round 6, guide §2): every
    * round already knows the exact edge count from the previous round's
    * checksum, so the ~5 shuffles inside a round are sized from the
    * DATA (targeting [[RoundRowsPerPartition]] rows/partition, floor 1)
    * instead of inheriting the session's fleet-sized constant — a
    * 300-edge canonicalization ran 5 rounds × 5 shuffles × 32 empty
    * partitions of pure task dispatch before this. The session setting
    * stays the CEILING (never more partitions than configured) and is
    * restored after the loop; large graphs are unaffected. */
  def run(edges0: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark = edges0.sparkSession
    var e = edges0.select(col("u").cast("long"), col("v").cast("long"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    var prev = checksum(e)
    var i = 0
    var converged = prev._1 == 0L
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions")
    def roundParts(rows: Long): Int =
      math.max(1L, math.min(rows / RoundRowsPerPartition,
        sessionParts.toLong)).toInt
    try {
      while (!converged && i < maxIter) {
        // planning of THIS round's single job (checksum materializes the
        // lazy checkpoint) reads the scoped setting; prev._1 is the
        // exact input edge count
        spark.conf.set("spark.sql.shuffle.partitions", roundParts(prev._1))
        e = smallStar(largeStar(e)).localCheckpoint(false)
        val cur = checksum(e)
        converged = cur == prev
        prev = cur
        i += 1
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", sessionParts)
    require(converged, s"connected components did not converge in $maxIter rounds")
    e // rows (u, v): v = canonical (min) id of u's component; v's own row absent
  }

  /** Target edge rows per round-shuffle partition (~a few MB of (u, v)
    * longs — small tasks on purpose: star rounds are join-heavy). */
  val RoundRowsPerPartition: Long = 65536L

  private def checksum(e: DataFrame): (Long, Long) =
    graft.util.Checksum.of(e, Seq("u", "v"))

  /** Full canonical map over a universe of entity ids: component minima
    * from `edges`, identity for untouched entities.
    *
    * Fast path: the same-as edge set is bounded by the entity VOCABULARY
    * (dictionary-sized — the alias dict is already broadcast elsewhere),
    * not the corpus, so when it fits the driver (`driverThreshold`) a
    * driver-side union-find replaces the multi-round star-contraction
    * fixpoint: one collect + a broadcast map instead of ~5 rounds × 1 job
    * each (measured 4.2 s of pure round overhead at 20k pages). The
    * distributed path remains for genuinely large graphs (q27 exercises
    * it directly). Both produce component-min semantics — the property
    * spec checks CC ≡ union-find. */
  def canonMap(
      entities: Dataset[java.lang.Long],
      edges: Dataset[SameAsEdge],
      driverThreshold: Long = 1L << 20): Dataset[CanonRow] = {
    val spark = entities.sparkSession
    import spark.implicits._
    val e = edges.toDF("u", "v")
    // one job: take(threshold+1) both answers "does it fit" and fetches
    // the edges when it does
    val taken = e.select(col("u").cast("long"), col("v").cast("long"))
      .take((driverThreshold + 1).toInt)
    if (taken.length <= driverThreshold) {
      val pairs = taken.map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      // iterative find + path compression: chain-ordered edge lists can
      // build parent chains as long as the edge list, and the threshold
      // admits 2^20 edges — recursion would overflow the driver stack
      def find(x0: Long): Long = {
        var root = x0
        while (parent.getOrElse(root, root) != root) root = parent(root)
        var x = x0
        while (x != root) { val nxt = parent(x); parent(x) = root; x = nxt }
        root
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
      }
      val members = (pairs.flatMap(p => Seq(p._1, p._2))).distinct
      val compMin: Map[Long, Long] = members.groupBy(find)
        .flatMap { case (_, ms) => val m = ms.min; ms.map(_ -> m) }
      val mapB = spark.sparkContext.broadcast(compMin)
      entities.map(e0 => CanonRow(e0, mapB.value.getOrElse(e0, e0)))
    } else {
      val cc = run(e)
      entities.toDF("entity_id")
        .join(cc.withColumnRenamed("u", "entity_id"), Seq("entity_id"), "left")
        .select(col("entity_id"),
          coalesce(col("v"), col("entity_id")).as("canon_id"))
        .as[CanonRow]
    }
  }
}
