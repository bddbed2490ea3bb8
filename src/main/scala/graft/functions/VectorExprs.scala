package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the embedding dot product.
  *
  * The built-in composable form (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * is a higher-order function, which Spark evaluates *interpreted* — no
  * whole-stage codegen, boxed lambda calls per element. For a KNN scan this
  * is the hot inner loop (corpus × queries × dims multiplications), so it
  * earns a real `Expression` with `doGenCode`: a tight primitive `double`
  * loop over the two ArrayData buffers, inlined into the generated stage.
  * Same summation order (left-to-right) as the HOF form and the DuckDB
  * oracle's `list_dot_product` → bit-identical results.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // ctx.freshName, not fixed locals: several DotProducts can land in
      // ONE generated function (e.g. cosine = dot/(norm·norm)), and with
      // non-nullable children Spark emits this block without an enclosing
      // brace scope — duplicate Java locals would fail Janino compilation
      // and silently fall back to interpreted eval.
      val n = ctx.freshName("dotN")
      val s = ctx.freshName("dotSum")
      val i = ctx.freshName("dotI")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  import org.apache.spark.sql.GraftSqlBridge

  /** Dot product Column over two Array[Double] columns, backed by the
    * codegen'd [[DotProduct]] expression. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
