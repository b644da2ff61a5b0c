package graft.ops

/** Per-key immutable interval index with exact first-match semantics
  * (reference clangd_call_graph_builder.py:124-201: sort by start,
  * scan, break at first containing interval).
  *
  * Entries are sorted by (lo, iid). The first match for a point p is the
  * LEFTMOST j with lo(j) <= p && hi(j) >= p. The naive scan is
  * O(#entries with lo <= p) per probe — ~m/2 on dense keys. This index
  * answers it in O(log m): binary-search the lo-prefix boundary K
  * (entries 0..K-1 all have lo <= p), then descend a max-hi segment
  * tree for the leftmost j < K with hi(j) >= p. Identical output to the
  * scan by construction (same sort order, same predicate), asserted by
  * the cross-path agreement specs.
  *
  * All hot-path state is primitive parallel arrays — no per-probe
  * boxing (the boxed-tuple probe loop benchmarked SLOWER than the typed
  * cogroup it was meant to beat).
  */
final class IntervalIndex private (
    n: Int,
    los: Array[Double],
    his: Array[Double],
    iids: Array[Long],
    tree: Array[Double]) { // tree(n+i) = his(i); tree(k) = max of children

  /** Index of the first-match entry for p, or -1. */
  def firstMatch(p: Double): Int = {
    // upper bound: first index with lo > p
    var a = 0
    var b = n
    while (a < b) {
      val mid = (a + b) >>> 1
      if (los(mid) <= p) a = mid + 1 else b = mid
    }
    val k = a // entries [0, k) have lo <= p
    if (k == 0) return -1
    // leftmost j < k with his(j) >= p, via tree descent
    leftmost(1, 0, n, k, p)
  }

  private def leftmost(node: Int, l: Int, r: Int, k: Int, p: Double): Int = {
    if (l >= k || tree(node) < p) return -1
    if (r - l == 1) return l // tree(node) = his(l) >= p and l < k
    val mid = (l + r) >>> 1
    val left = leftmost(2 * node, l, mid, k, p)
    if (left >= 0) left else leftmost(2 * node + 1, mid, r, k, p)
  }

  def iidAt(j: Int): Long = iids(j)
  def size: Int = n
}

object IntervalIndex {

  /** Build from unsorted (lo, hi, iid) triples. */
  def build(entries: Array[(Double, Double, Long)]): IntervalIndex = {
    val n = entries.length
    val sorted = entries.sortBy(e => (e._1, e._3)) // (lo, iid) — frozen tie-break
    val los = new Array[Double](n)
    val his = new Array[Double](n)
    val iids = new Array[Long](n)
    var i = 0
    while (i < n) {
      los(i) = sorted(i)._1; his(i) = sorted(i)._2; iids(i) = sorted(i)._3
      i += 1
    }
    // power-of-two-free segment tree over [0, n): node 1 covers all,
    // children split at midpoint — matches the descent above
    val tree = new Array[Double](math.max(4 * n, 4))
    def init(node: Int, l: Int, r: Int): Double = {
      val v =
        if (r - l == 1) his(l)
        else {
          val mid = (l + r) >>> 1
          math.max(init(2 * node, l, mid), init(2 * node + 1, mid, r))
        }
      tree(node) = v
      v
    }
    if (n > 0) init(1, 0, n)
    new IntervalIndex(n, los, his, iids, tree)
  }
}
