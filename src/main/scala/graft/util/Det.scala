package graft.util

/** Deterministic hashing / pseudo-randomness helpers.
  *
  * Everything the pipeline derives "randomly" (synthetic corpus content,
  * salting, fake embeddings) is a pure function of explicit long inputs via
  * SplitMix64 (public domain, Steele et al., "Fast Splittable Pseudorandom
  * Number Generators", OOPSLA'14). No `scala.util.Random`, no wall clock —
  * the reference achieves determinism with a fake LLM client
  * (reference: llm_client.py:93-99); we achieve it by construction.
  */
object Det {
  /** SplitMix64 finalizer: a high-quality 64-bit mix. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Combine any number of longs into one deterministic hash. */
  def h(parts: Long*): Long = {
    var acc = 0x51_7c_c1_b7_27_22_0a_95L
    parts.foreach { p => acc = mix64(acc ^ p) }
    acc
  }

  /** Stable string hash (not String.hashCode — 64-bit, well mixed). */
  def hashStr(s: String): Long = {
    var acc = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { acc = mix64(acc ^ s.charAt(i).toLong); i += 1 }
    acc
  }

  /** xxhash64 of raw bytes, identical to Spark SQL's `xxhash64(col)` on a
    * BinaryType column (seed 42) — the ONE frozen url-dedup tie-break key
    * shared by Extract.run / Extract.dedupLatest / Incremental.diff and
    * the sequential test oracle (NaiveKg). */
  def xxh64Bytes(bytes: Array[Byte]): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      bytes.length, 42L)

  /** Uniform double in [0, 1) from a hash. */
  def unit(x: Long): Double = ((x >>> 11).toDouble) / (1L << 53).toDouble

  /** Non-negative Int in [0, n) from a hash. */
  def nonNeg(x: Long, n: Int): Int = (((x % n) + n) % n).toInt

  /** Zipf-ish rank pick in [0, n): P(k) roughly proportional to 1/(k+1).
    * Log-uniform inverse-CDF approximation — deterministic, heavy head. */
  def zipf(x: Long, n: Int): Int = {
    val u = unit(x)
    val k = math.floor(math.exp(u * math.log(n.toDouble))).toInt - 1
    math.min(math.max(k, 0), n - 1)
  }
}
