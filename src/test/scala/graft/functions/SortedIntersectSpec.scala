package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins [[SortedIntersectCount]] / [[SortedIntersectCount3]] — the
  * allocation-free merge counts the near-dup scorers use — EQUAL to the
  * built-in `size(array_intersect(...))` spelling they replaced, on
  * randomized sorted inputs (duplicates included), through the actual
  * codegen path (DataFrame evaluation) and the interpreted path
  * (direct eval). A divergence here would silently move dedup verdicts. */
class SortedIntersectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260819)
  private def sortedArr(maxLen: Int, valRange: Int): Seq[Long] =
    Seq.fill(rnd.nextInt(maxLen + 1))(rnd.nextInt(valRange).toLong).sorted

  test("binary count equals size(array_intersect) on randomized sorted arrays") {
    val rows = Seq.fill(500)((sortedArr(40, 60), sortedArr(40, 60))) ++
      Seq((Seq.empty[Long], Seq(1L, 2L)), (Seq(1L, 1L, 2L), Seq(1L, 2L, 2L, 3L)),
        (Seq.empty[Long], Seq.empty[Long]))
    val df = rows.toDF("a", "b")
    val got = df.select(
      SortedIntersectExpression.sorted_intersect_count(col("a"), col("b")).as("merge"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
    assert(got.filter(col("merge") =!= col("builtin")).count() == 0)
  }

  test("ternary count equals the nested built-in spelling") {
    val rows = Seq.fill(500)((sortedArr(30, 40), sortedArr(30, 40), sortedArr(30, 40))) ++
      Seq((Seq(1L, 2L, 3L), Seq(2L, 3L), Seq.empty[Long]),
        (Seq(5L, 5L, 7L), Seq(5L, 7L, 7L), Seq(5L, 6L, 7L)))
    val df = rows.toDF("a", "b", "c")
    val got = df.select(
      SortedIntersectExpression.sorted_intersect_count3(col("a"), col("b"), col("c")).as("merge"),
      size(array_intersect(array_intersect(col("a"), col("b")), col("c")))
        .cast("long").as("builtin"))
    assert(got.filter(col("merge") =!= col("builtin")).count() == 0)
  }

  test("null input arrays propagate null; interpreted eval matches") {
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]])).toDF("a", "b")
    val out = df.select(
      SortedIntersectExpression.sorted_intersect_count(col("a"), col("b"))).head
    assert(out.isNullAt(0))
    // interpreted path (no codegen): direct expression eval
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    def lit(xs: Seq[Long]) =
      Literal(ArrayData.toArrayData(xs.toArray), ArrayType(LongType))
    val e2 = SortedIntersectCount(lit(Seq(1L, 2L, 2L, 5L)), lit(Seq(2L, 5L, 5L, 9L)))
    assert(e2.eval(null) == 2L)
    val e3 = SortedIntersectCount3(lit(Seq(1L, 2L, 5L)), lit(Seq(2L, 5L)), lit(Seq(5L)))
    assert(e3.eval(null) == 1L)
  }
}
