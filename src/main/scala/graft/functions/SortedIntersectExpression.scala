package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Merge-intersection COUNT over SORTED int64 hash arrays — the set-scoring
  * hot path of the near-dup family (optimization round 14, guide §4).
  *
  * Every candidate-pair scorer in Dedup (`ngram_jaccard`, `containment`,
  * `containment_kmv`, `lsh_tune`, `source_overlap_kmv`) needs ONLY
  * `size(array_intersect(a, b))`: the built-in spelling builds a hash set
  * of one side and ALLOCATES the intersection array per pair, then throws
  * everything but its length away — per-pair garbage exactly where the
  * operator is quadratic-ish (pairs ≫ docs at every scale). Both sides are
  * already `array_sort`ed hash arrays, so the count is a single allocation-
  * free two-pointer merge: O(|a|+|b|) primitive compares inside whole-stage
  * codegen, no set, no result array.
  *
  * Semantics: equal to `size(array_intersect(a, b))` — the number of
  * DISTINCT common values (duplicate runs are skipped on both sides) —
  * PRECONDITIONED on both inputs being ascending-sorted and null-element-
  * free (hash arrays by construction at every call site; SortedIntersectSpec
  * pins equality against the built-in on randomized inputs). Null INPUT
  * arrays propagate null as usual.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    SortedIntersectExpression.checkLongArrays(prettyName, left, right)
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        cnt += 1
        while (i < n && x.getLong(i) == xv) i += 1
        while (j < m && y.getLong(j) == yv) j += 1
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else {
         |    $cnt++;
         |    while ($i < $n && $a.getLong($i) == $xv) { $i++; }
         |    while ($j < $m && $b.getLong($j) == $yv) { $j++; }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Three-way merge-intersection count — `size(array_intersect(
  * array_intersect(a, b), c))` for sorted null-free int64 arrays, in one
  * pass with no intermediate arrays (the KMV union-sketch estimators
  * compute `|M ∩ sa ∩ sb|` per pair). Same precondition and distinctness
  * semantics as [[SortedIntersectCount]]. */
case class SortedIntersectCount3(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    SortedIntersectExpression.checkLongArrays(prettyName, first, second, third)
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count3"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val z = c.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements(); val p = z.numElements()
    var i = 0; var j = 0; var k = 0
    var cnt = 0L
    while (i < n && j < m && k < p) {
      val xv = x.getLong(i); val yv = y.getLong(j); val zv = z.getLong(k)
      if (xv == yv && yv == zv) {
        cnt += 1
        while (i < n && x.getLong(i) == xv) i += 1
        while (j < m && y.getLong(j) == yv) j += 1
        while (k < p && z.getLong(k) == zv) k += 1
      } else {
        // advance every pointer strictly below the current maximum
        var mx = xv
        if (yv > mx) mx = yv
        if (zv > mx) mx = zv
        if (xv < mx) i += 1
        if (yv < mx) j += 1
        if (zv < mx) k += 1
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m"); val p = ctx.freshName("p")
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv"); val zv = ctx.freshName("zv")
      val mx = ctx.freshName("mx"); val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements(); int $p = $c.numElements();
         |int $i = 0; int $j = 0; int $k = 0; long $cnt = 0L;
         |while ($i < $n && $j < $m && $k < $p) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  long $zv = $c.getLong($k);
         |  if ($xv == $yv && $yv == $zv) {
         |    $cnt++;
         |    while ($i < $n && $a.getLong($i) == $xv) { $i++; }
         |    while ($j < $m && $b.getLong($j) == $yv) { $j++; }
         |    while ($k < $p && $c.getLong($k) == $zv) { $k++; }
         |  } else {
         |    long $mx = $xv;
         |    if ($yv > $mx) { $mx = $yv; }
         |    if ($zv > $mx) { $mx = $zv; }
         |    if ($xv < $mx) { $i++; }
         |    if ($yv < $mx) { $j++; }
         |    if ($zv < $mx) { $k++; }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SortedIntersectExpression {
  /** Manual input-type check (ExpectsInputTypes' AbstractDataType is
    * private[sql]): every child must be array<long>. */
  private[functions] def checkLongArrays(name: String, children: Expression*): TypeCheckResult = {
    val bad = children.find(c => c.dataType match {
      case ArrayType(LongType, _) => false
      case _ => true
    })
    bad match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<bigint> inputs, got ${c.dataType.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  /** `size(array_intersect(a, b))` for sorted null-free array<long>,
    * as one codegen'd allocation-free merge; returns long. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** `size(array_intersect(array_intersect(a, b), c))`, same contract. */
  def sorted_intersect_count3(a: Column, b: Column, c: Column): Column =
    GraftSqlBridge.column(SortedIntersectCount3(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b),
      GraftSqlBridge.expression(c)))
}
