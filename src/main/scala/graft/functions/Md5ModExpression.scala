package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

import graft.mr.Md5Partitioning

/** Reference-exact md5-mod-R routing as a Catalyst expression:
  * `int(md5(key_utf8), 16) % R` (SURVEY.md §2.1 F4, goldens in
  * `/root/reference/tests/test_worker_08.py:226-243`).
  *
  * The RDD-level [[graft.mr.Md5LinePartitioner]] serves the byte-compat MR
  * pipeline; this expression brings the same routing to DataFrame land —
  * `df.repartition(R, md5_mod(col, R))` followed by
  * `sortWithinPartitions` reproduces the reference's shuffle layout inside
  * a fully declarative plan (so Catalyst can still prune/push around it).
  * Codegen calls straight into the shared digest routine — one virtual
  * call per row, no boxing of the hot loop.
  */
case class Md5Mod(child: Expression, numPartitions: Int) extends UnaryExpression {
  require(numPartitions > 0, "numPartitions must be positive")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "md5_mod"

  def compute(s: UTF8String): Int = Md5Partitioning.partition(s.toString, numPartitions)

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5mod", this, classOf[Md5Mod].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5ModExpression {
  def md5_mod(c: Column, r: Int): Column =
    GraftSqlBridge.column(Md5Mod(GraftSqlBridge.expression(c), r))
}
