package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Native unordered-pair generation over a long-array column: all
  * (x = a(i), y = a(j)) with i < j, in (i, j) order — value-identical to
  * the nested-transform shape it replaces (kept as
  * [[graft.emit.Emit.pairsHof]], spec-pinned):
  * `flatten(transform(es, (a, i) => transform(slice(es, i+2, size(es)),
  * b => struct(a AS x, b AS y))))`.
  *
  * Output size is n·(n−1)/2 — callers bound n BEFORE this expression
  * (Emit.RelatesCap does). One loop instead of an interpreted
  * per-element lambda tree that allocates a sliced array per anchor.
  * Null elements are not expected (callers build the array from
  * collect_set) and are rejected loudly rather than mis-paired.
  * doGenCode keeps the flagship emit projection this runs in inside
  * whole-stage codegen (the generated code calls `compute` on a
  * referenced instance).
  */
case class ArrayPairs(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("x", LongType, nullable = false),
      StructField("y", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_pairs expects array<bigint>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("arrayPairs", this, classOf[ArrayPairs].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(input: ArrayData): ArrayData = {
    val arr = input
    val n = arr.numElements()
    val vs = new Array[Long](n)
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i), "array_pairs: null element")
      vs(i) = arr.getLong(i)
      i += 1
    }
    val out = new Array[AnyRef](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val row = new GenericInternalRow(2)
        row.setLong(0, vs(i))
        row.setLong(1, vs(j))
        out(k) = row
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayPairs =
    copy(child = newChild)

  override def prettyName: String = "array_pairs"
}

object ArrayPairs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point. */
  def array_pairs(es: Column): Column =
    ColumnBridge.column(ArrayPairs(ColumnBridge.expression(es)))
}
