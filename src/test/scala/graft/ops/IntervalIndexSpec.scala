package graft.ops

import graft.SparkSpec
import graft.util.Det

/** IntervalIndex (binary search + max-hi segment tree) against the
  * naive sorted scan it replaces — exhaustive agreement on deterministic
  * pseudo-random inputs incl. ties, nesting, empties, single entries. */
class IntervalIndexSpec extends SparkSpec {

  private def naive(entries: Array[(Double, Double, Long)], p: Double): Long = {
    val sorted = entries.sortBy(e => (e._1, e._3))
    var i = 0
    while (i < sorted.length && sorted(i)._1 <= p) {
      if (p <= sorted(i)._2) return sorted(i)._3
      i += 1
    }
    -1L
  }

  test("agrees with the naive first-match scan on 200 random indexes") {
    for (c <- 0 until 200) {
      val m = (Det.mix64(c.toLong) % 40 + 1).toInt.abs
      val entries = Array.tabulate(m) { i =>
        val lo = Math.floorMod(Det.mix64(c * 1000L + i), 50L).toDouble
        // narrow lo range + overlapping widths force ties and nesting
        (lo, lo + Math.floorMod(Det.mix64(c * 1000L + i + 7), 30L).toDouble,
          i.toLong)
      }
      val idx = IntervalIndex.build(entries)
      for (pi <- 0 until 80) {
        val p = Math.floorMod(Det.mix64(c * 77L + pi), 90L).toDouble - 5.0
        val j = idx.firstMatch(p)
        val got = if (j < 0) -1L else idx.iidAt(j)
        assert(got == naive(entries, p),
          s"case $c p=$p: index gave $got, scan gave ${naive(entries, p)}")
      }
    }
  }

  test("duplicate (lo, iid-ordered) ties pick the lowest iid") {
    val idx = IntervalIndex.build(Array((0.0, 10.0, 7L), (0.0, 10.0, 3L)))
    assert(idx.iidAt(idx.firstMatch(5.0)) == 3L)
  }

  test("empty and miss cases") {
    assert(IntervalIndex.build(Array.empty).firstMatch(1.0) == -1)
    val idx = IntervalIndex.build(Array((2.0, 4.0, 1L)))
    assert(idx.firstMatch(1.0) == -1) // before any lo
    assert(idx.firstMatch(5.0) == -1) // lo <= p but hi < p
    assert(idx.iidAt(idx.firstMatch(3.0)) == 1L)
  }
}
