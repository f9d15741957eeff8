package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the embedding hot path.
  *
  * The built-in route (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) evaluates
  * interpreted `ArrayAggregate`/`ZipWith` lambdas — ~µs per element, and it
  * lands inside join conditions where it runs once per candidate *pair*.
  * [[DotProduct]] compiles to a tight primitive loop inside whole-stage
  * codegen (~ns per element), keeping brute-force similarity scans and
  * near-dup joins CPU-bound on actual arithmetic. Fold order is strictly
  * left-to-right, matching the DuckDB oracle's
  * `list_sum(list_transform(...))` evaluation, so scores agree bitwise.
  *
  * Null discipline: null arrays propagate null (standard `BinaryExpression`
  * nullSafeEval); null *elements* are not expected (embeddings are dense) —
  * elements are read primitively for speed.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Codegen'd dot product of two array<double> columns. */
  def vec_dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** L2 norm. */
  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))
}
