package graft.functions

import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the custom Catalyst expressions: makes `vec_dot`,
  * `word_shingles`, and `md5_mod` callable from `spark.sql(...)` — not just
  * the Column API — through the two standard wiring paths:
  *
  *  1. Cluster config (no code changes for the user):
  *     `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *     instantiates this class and injects the functions into every new
  *     session's registry.
  *  2. A live session (notebook path): `GraftExtensions.register(spark)`.
  *
  * Both routes register the SAME codegen'd expressions the Column API
  * uses — a SQL query calling `vec_dot` gets the tight primitive loop
  * inside whole-stage codegen, not a UDF. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // Scan-pruning rule: inverts the loader's monotone ts normalization in
    // literal comparisons so time-range predicates reach PushedFilters on
    // the raw parquet column (see TsComparisonPushdown's scaladoc).
    ext.injectOptimizerRule(_ => graft.plans.TsComparisonPushdown)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a literal INT, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  /** (identifier, info, builder) triples in the exact shape
    * `SparkSessionExtensions.injectFunction` and
    * `FunctionRegistry.registerFunction` share. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        arity("vec_dot", args, 2); DotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        arity("word_shingles", args, 2)
        WordShingles(args(0), intLit(args(1), "word_shingles", "n"))
      }),
    (FunctionIdentifier("md5_mod"),
      new ExpressionInfo(classOf[Md5Mod].getName, "md5_mod"),
      (args: Seq[Expression]) => {
        arity("md5_mod", args, 2)
        Md5Mod(args(0), intLit(args(1), "md5_mod", "numPartitions"))
      }),
    (FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fps"),
      (args: Seq[Expression]) => {
        arity("winnow_fps", args, 3)
        WinnowFingerprints(args(0), intLit(args(1), "winnow_fps", "k"),
          intLit(args(2), "winnow_fps", "w"))
      }))

  /** Register into an already-running session (functions + the pushdown
    * rule — `extraOptimizations` runs before physical planning, which is
    * when PushedFilters are extracted, so the late batch still prunes). */
  def register(spark: SparkSession): Unit = {
    val registry = GraftSqlBridge.functionRegistry(spark)
    functions.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.TsComparisonPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.TsComparisonPushdown
  }
}
