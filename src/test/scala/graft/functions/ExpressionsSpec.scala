package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.mr.Md5Partitioning

class ExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("md5_mod expression agrees with the RDD partitioner for varied keys") {
    import spark.implicits._
    val keys = Seq("", "bye", "hello", "world", "goodbye", "hadoop", "éclat", "a b\tc", "0")
    for (r <- Seq(1, 2, 5, 32)) {
      val got = keys.toDF("k")
        .select(col("k"), Md5ModExpression.md5_mod(col("k"), r).as("p"))
        .collect().map(x => x.getString(0) -> x.getInt(1)).toMap
      keys.foreach { k => assert(got(k) === Md5Partitioning.partition(k, r), s"key=$k r=$r") }
    }
  }

  test("md5_mod reproduces the test_worker_08 routing goldens in a DataFrame plan") {
    import spark.implicits._
    val df = Seq("", "bye", "hello", "world", "goodbye", "hadoop").toDF("word")
      .repartition(2, Md5ModExpression.md5_mod(col("word"), 2))
    // Routing golden: "", bye, hello → 0; world, goodbye, hadoop → 1.
    val byPart = df.select(col("word"), Md5ModExpression.md5_mod(col("word"), 2).as("p"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(Seq("", "bye", "hello").forall(byPart(_) == 0))
    assert(Seq("world", "goodbye", "hadoop").forall(byPart(_) == 1))
  }

  test("vec_dot handles nulls and length mismatch defensively") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0, 9.0))),
      (None, Some(Array(1.0)))
    ).toDF("a", "b")
    val rows = df.select(VectorExpressions.vec_dot(col("a"), col("b"))).collect()
    assert(rows(0).getDouble(0) === 11.0) // min-length fold
    assert(rows(1).isNullAt(0))           // null array → null
  }
}
