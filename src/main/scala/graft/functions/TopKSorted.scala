package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-K-smallest aggregate: the sorted (ascending, in the
  * type's SQL order — identical to `array_sort`) array of the `k`
  * smallest values of `child` in the group, as a multiset
  * (`distinct = false`, ≙ `slice(array_sort(collect_list(v)), 1, k)`) or
  * a set (`distinct = true`, ≙ `slice(array_sort(collect_set(v)), 1, k)`).
  * Nulls contribute nothing, exactly like `collect_*`. Supported element
  * types: string (UTF8 binary order), bigint, binary (unsigned
  * lexicographic, then length — Spark's BinaryType order); a roll-up
  * over any other payload type fails analysis loudly instead of
  * regressing to the unbounded collect shape.
  *
  * Unlike the slice-after-collect shape — where the `collect_*` buffer
  * materializes the ENTIRE group before the slice projection truncates
  * it — the bound here is structural: `insert` evicts the largest element
  * the moment the buffer exceeds `k`, so no aggregation buffer (partial,
  * merge, or spilled) ever holds more than `k` elements, regardless of
  * group size. A 10⁸-page head site costs the same buffer as a 10-page
  * one. This is the scale policy behind the enrichment context collect
  * and the hierarchy roll-up sample (Enrich.ContextCap / RollupCap — the
  * reference feeds its summarizer every child,
  * code_graph_rag_generator.py:408-423; the capped sample is this
  * engine's 100-TB-safe replacement, same outputs on capped-size groups).
  *
  * TypedImperativeAggregate → ObjectHashAggregateExec with map-side
  * partial aggregation: a skewed key's partial buffers are each ≤ k and
  * merge pairwise at ≤ k, so the salted two-phase workaround this
  * replaces is unnecessary.
  */
case class TopKSorted(
    child: Expression,
    k: Int,
    distinct: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKSorted.Buffer] with UnaryLike[Expression] {
  require(k > 0, s"topk_sorted k must be positive: $k")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk_sorted expects string, bigint or binary, got $other")
    }

  override def createAggregationBuffer(): TopKSorted.Buffer =
    new TopKSorted.Buffer(k, distinct, child.dataType)

  override def update(b: TopKSorted.Buffer, input: InternalRow): TopKSorted.Buffer = {
    val v = child.eval(input)
    // owned = false: a UTF8String may point into a reused row buffer, so
    // the buffer clones it — but only on the path that actually stores
    // it; insert's reject fast-path must not pay an allocation per row
    // of a saturated head group (boxed longs are immutable and a
    // BinaryType eval already copies out of the row — never cloned)
    if (v != null) b.insert(v.asInstanceOf[AnyRef], 1L, owned = false)
    b
  }

  override def merge(b: TopKSorted.Buffer, other: TopKSorted.Buffer): TopKSorted.Buffer = {
    val it = other.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      b.insert(e.getKey, e.getValue)
    }
    b
  }

  override def eval(b: TopKSorted.Buffer): Any = {
    val out = new Array[AnyRef](b.total.toInt)
    var i = 0
    val it = b.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      var c = e.getValue
      while (c > 0) { out(i) = e.getKey; i += 1; c -= 1 }
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKSorted.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.map.size())
    val it = b.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      child.dataType match {
        case StringType =>
          val bytes = e.getKey.asInstanceOf[UTF8String].getBytes
          out.writeInt(bytes.length)
          out.write(bytes)
        case BinaryType =>
          val bytes = e.getKey.asInstanceOf[Array[Byte]]
          out.writeInt(bytes.length)
          out.write(bytes)
        case _ =>
          out.writeLong(e.getKey.asInstanceOf[java.lang.Long].longValue())
      }
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKSorted.Buffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new TopKSorted.Buffer(k, distinct, child.dataType)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val v: AnyRef = child.dataType match {
        case StringType =>
          val len = in.readInt()
          val arr = new Array[Byte](len)
          in.readFully(arr)
          UTF8String.fromBytes(arr)
        case BinaryType =>
          val len = in.readInt()
          val arr = new Array[Byte](len)
          in.readFully(arr)
          arr
        case _ => java.lang.Long.valueOf(in.readLong())
      }
      b.insert(v, in.readLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSorted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSorted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKSorted =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "topk_sorted"
}

object TopKSorted {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Element order of the buffer, matching `array_sort` on the type. */
  private[functions] def orderingOf(dt: DataType): java.util.Comparator[AnyRef] =
    dt match {
      case StringType => (a: AnyRef, b: AnyRef) =>
        a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
      case LongType => (a: AnyRef, b: AnyRef) =>
        java.lang.Long.compare(
          a.asInstanceOf[java.lang.Long].longValue(),
          b.asInstanceOf[java.lang.Long].longValue())
      case BinaryType => (a: AnyRef, b: AnyRef) =>
        compareBinaryUnsigned(
          a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
      case other => throw new IllegalStateException(s"topk_sorted: $other")
    }

  /** Unsigned lexicographic, shorter-prefix-first — Spark's BinaryType
    * SQL ordering (TypeUtils.compareBinary semantics). */
  private[functions] def compareBinaryUnsigned(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = (a(i) & 0xff) - (b(i) & 0xff)
      if (x != 0) return x
      i += 1
    }
    a.length - b.length
  }

  /** Bounded buffer: a TreeMap in the element type's SQL order
    * (value → multiplicity) holding at most `k` elements counting
    * multiplicity; inserting while full evicts from the largest key.
    * Distinct mode caps every multiplicity at 1. */
  final class Buffer(k: Int, distinct: Boolean, dt: DataType) {
    val map = new java.util.TreeMap[AnyRef, java.lang.Long](orderingOf(dt))
    var total: Long = 0L

    // borrowed strings are cloned ONLY when a new key is actually
    // stored; TreeMap.put on an existing key keeps the old key object,
    // so the increment path never needs a copy either
    private def own(v: AnyRef, owned: Boolean): AnyRef =
      if (owned) v
      else dt match {
        case StringType => v.asInstanceOf[UTF8String].clone()
        case _ => v
      }

    def insert(v: AnyRef, count: Long, owned: Boolean = true): Unit = {
      // full and not smaller than the current max → cannot change the
      // top-k (equal-to-max: distinct already holds it; multiset would
      // add a copy only to evict it again in the trim)
      if (total >= k && map.comparator().compare(v, map.lastKey()) >= 0) return
      val prev = map.get(v)
      if (distinct) {
        if (prev != null) return
        map.put(own(v, owned), 1L)
        total += 1
      } else {
        if (prev != null) map.put(v, prev + count)
        else map.put(own(v, owned), count)
        total += count
      }
      while (total > k) {
        val last = map.lastEntry()
        val over = total - k
        if (last.getValue <= over) {
          total -= last.getValue
          map.remove(last.getKey)
        } else {
          map.put(last.getKey, last.getValue - over)
          total -= over
        }
      }
      if (peakTracking) notePeak(map.size())
    }
  }

  // test-scope instrumentation: assert the structural bound really holds
  @volatile var peakTracking: Boolean = false
  private val peak = new java.util.concurrent.atomic.AtomicInteger(0)
  def resetPeak(): Unit = peak.set(0)
  def observedPeak: Int = peak.get()
  private def notePeak(n: Int): Unit = {
    var cur = peak.get()
    while (n > cur && !peak.compareAndSet(cur, n)) cur = peak.get()
  }

  /** Column-API entry point: ascending sorted array of the `k` smallest
    * values (multiset; `distinct = true` for the k smallest distinct). */
  def topk_sorted(c: Column, k: Int, distinct: Boolean): Column =
    ColumnBridge.column(
      TopKSorted(ColumnBridge.expression(c), k, distinct).toAggregateExpression())
}
