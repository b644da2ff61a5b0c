package graft.functions

import graft.util.UrlKit
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for URL percent-decoding (the optional
  * custom piece from SURVEY.md §4: "a native Expression for
  * percent-decode if UDF overhead shows up" — a Scala UDF pays
  * serialization + codegen-boundary cost per row; this stays inside
  * whole-stage codegen via a static-method call).
  *
  * Semantics identical to UrlKit.percentDecode (frozen policy: valid
  * %XX → byte, UTF-8 replacement decode, malformed '%' literal).
  */
case class PercentDecode(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      UrlKit.percentDecode(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.util.UrlKit.percentDecode($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): PercentDecode =
    copy(child = newChild)

  override def prettyName: String = "percent_decode"
}

object PercentDecode {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point (Spark 4 hides Column↔Expression bridges —
    * see graftbridge.ColumnBridge). */
  def percent_decode(c: Column): Column =
    ColumnBridge.column(PercentDecode(ColumnBridge.expression(c)))

  /** SQL registration: SELECT percent_decode(url) FROM ... */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "percent_decode", exprs => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"percent_decode expects exactly 1 argument, got ${exprs.length}")
        PercentDecode(exprs.head)
      }, "built-in")
}
