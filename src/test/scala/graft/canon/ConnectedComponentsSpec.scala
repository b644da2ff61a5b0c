package graft.canon

import graft.SparkSpec
import graft.model.SameAsEdge
import graft.util.Det

class ConnectedComponentsSpec extends SparkSpec {

  private def canonOf(edges: Seq[(Long, Long)], universe: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    val es = spark.createDataset(edges.map(e => SameAsEdge(e._1, e._2)))
    val ents = spark.createDataset(universe.map(java.lang.Long.valueOf))
    ConnectedComponents.canonMap(ents, es)
      .collect().map(c => c.entity_id -> c.canon_id).toMap
  }

  /** Independent union-find for verification. */
  private def ufCanon(edges: Seq[(Long, Long)], universe: Seq[Long]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    universe.groupBy(find).flatMap { case (_, m) => val mn = m.min; m.map(_ -> mn) }
  }

  test("chain, star, isolated nodes") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (12L, 10L))
    val uni = (0L to 13L)
    canonOf(edges, uni) shouldBe ufCanon(edges, uni)
  }

  test("skewed star component (head entity)") {
    val edges = (1L to 500L).map(k => (k * 7 % 997, 3L)) ++ Seq((900L, 901L))
    val uni = 0L to 1000L
    canonOf(edges, uni) shouldBe ufCanon(edges, uni)
  }

  test("empty edge set → identity map") {
    canonOf(Nil, 0L to 5L) shouldBe (0L to 5L).map(k => k -> k).toMap
  }

  test("driver fast path survives a 30k-edge chain (no recursion overflow)") {
    // chain-ordered unions build worst-case parent chains; the iterative
    // find with path compression must not blow the driver stack
    val n = 30000L
    val edges = (1L until n).map(i => (i, i + 1))
    val got = canonOf(edges, 1L to n)
    got.values.toSet shouldBe Set(1L)
  }

  test("property: CC equals union-find on 8 deterministic random graphs") {
    (0 until 8).foreach { trial =>
      val n = 2 + Det.nonNeg(Det.h(7L, trial.toLong, 1L), 39)
      val m = Det.nonNeg(Det.h(7L, trial.toLong, 2L), 61)
      val es = (0 until m).map { j =>
        (Det.nonNeg(Det.h(7L, trial.toLong, 10L + j), n).toLong,
          Det.nonNeg(Det.h(7L, trial.toLong, 200L + j), n).toLong)
      }
      val uni = 0L until n.toLong
      withClue(s"trial=$trial n=$n m=$m: ") {
        canonOf(es, uni) shouldBe ufCanon(es, uni)
      }
    }
  }
}
