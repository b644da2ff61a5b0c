package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Whole-operator Catalyst tier for the interval first-match join
  * (SURVEY.md §4 optional item; semantics identical to
  * ops.IntervalJoin.firstMatch — reference
  * clangd_call_graph_builder.py:124-201): a custom LogicalPlan planned by
  * an injected SparkStrategy into a co-partitioned physical operator that
  * builds a sorted per-key interval index once per partition and probes
  * each point in start order, first hit wins.
  *
  * Why a custom node instead of the cogroup path: the typed cogroup
  * round-trips both sides through object serialization
  * (DeserializeToObject → CoGroup → SerializeFromObject); this operator
  * stays on InternalRow end-to-end — no encoder boundary — and declares
  * ClusteredDistribution(key) on both children so EnsureRequirements
  * plans the same single pair of hash exchanges a ShuffledHashJoin gets.
  * The cogroup path remains as the no-extensions fallback
  * (IntervalJoin.firstMatchAuto).
  */
final case class IntervalFirstMatch(
    left: LogicalPlan, // points (key long, p double, pid long)
    right: LogicalPlan, // intervals (key long, lo double, hi double, iid long)
    // constructor field (NOT a body val): copy()/withNewChildrenInternal
    // must preserve these exprIds or every parent reference dangles
    output: Seq[Attribute] = IntervalFirstMatch.freshOutput())
  extends BinaryNode {
  // execution consumes every child column by name; without this,
  // ColumnPruning sees an expression-free node and strips the children
  // to zero columns
  override lazy val references: AttributeSet =
    AttributeSet(left.output ++ right.output)
  override def producedAttributes: AttributeSet = outputSet
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalFirstMatch =
    copy(left = newLeft, right = newRight)
}

object IntervalFirstMatch {
  private def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("pid", LongType, nullable = false)(),
    AttributeReference("iid", LongType, nullable = false)(),
    AttributeReference("key", LongType, nullable = false)())
}

/** Planner strategy — injected via GraftExtensions
  * (spark.sql.extensions=graft.GraftExtensions). */
class IntervalFirstMatchStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: IntervalFirstMatch =>
      IntervalFirstMatchExec(n.output, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

final case class IntervalFirstMatchExec(
    override val output: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  private def col(plan: SparkPlan, name: String): Int = {
    val i = plan.output.indexWhere(_.name == name)
    require(i >= 0, s"IntervalFirstMatchExec: child misses column '$name' " +
      s"(has ${plan.output.map(_.name).mkString(", ")})")
    i
  }

  // both children clustered on their key column → EnsureRequirements
  // inserts ONE compatible pair of hash exchanges (the ShuffledHashJoin
  // shape); partition i of points meets partition i of intervals
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(left.output(col(left, "key")))),
    ClusteredDistribution(Seq(right.output(col(right, "key")))))

  override protected def doExecute(): RDD[InternalRow] = {
    val (pKey, pP, pPid) = (col(left, "key"), col(left, "p"), col(left, "pid"))
    val (iKey, iLo, iHi, iIid) =
      (col(right, "key"), col(right, "lo"), col(right, "hi"), col(right, "iid"))
    require(left.output(pP).dataType == DoubleType &&
      right.output(iLo).dataType == DoubleType,
      "IntervalFirstMatchExec expects double-typed p/lo/hi")
    left.execute().zipPartitions(right.execute()) { (points, intervals) =>
      // per-key IntervalIndex (primitive arrays + max-hi segment tree:
      // O(log m) exact first-match probes) built once per partition.
      // Primitives are extracted immediately: the iterator reuses its
      // UnsafeRow, so no row references may be buffered.
      val acc = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[(Double, Double, Long)]]()
      intervals.foreach { r =>
        acc.computeIfAbsent(r.getLong(iKey), _ =>
          scala.collection.mutable.ArrayBuffer.empty)
          .append((r.getDouble(iLo), r.getDouble(iHi), r.getLong(iIid)))
      }
      val byKey = new java.util.HashMap[Long, graft.ops.IntervalIndex](acc.size())
      acc.forEach((k, b) => byKey.put(k, graft.ops.IntervalIndex.build(b.toArray)))
      val proj = UnsafeProjection.create(Array(LongType, LongType, LongType)
        : Array[org.apache.spark.sql.types.DataType])
      val out = new GenericInternalRow(3)
      points.flatMap { r =>
        val idx = byKey.get(r.getLong(pKey))
        if (idx == null) Iterator.empty
        else {
          val j = idx.firstMatch(r.getDouble(pP))
          if (j < 0) Iterator.empty
          else {
            out.update(0, r.getLong(pPid))
            out.update(1, idx.iidAt(j))
            out.update(2, r.getLong(pKey))
            Iterator.single(proj(out))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalFirstMatchExec =
    copy(left = newLeft, right = newRight)
}
