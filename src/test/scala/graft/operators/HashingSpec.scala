package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The three spellings of the portable 56-bit md5 hash — Column
  * ([[Hashing.md5Long]]), Spark-SQL text ([[Hashing.md5LongSparkSql]],
  * for expr-string lambdas), and the driver JVM twin
  * ([[Hashing.md5LongJvm]]) — must stay bit-identical: every cross-engine
  * oracle and every driver-recompute spec rests on it. */
class HashingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("Column, Spark-SQL-text, and JVM spellings agree on a token sample") {
    import spark.implicits._
    val samples = Seq("", "a", "alpha", "w:0", "w:4095", "the quick brown fox",
      "0123456789", "ünïcödé", "x" * 500)
    val rows = samples.toDF("s")
      .select(Hashing.md5Long(col("s")).as("c"),
        expr(Hashing.md5LongSparkSql("s")).as("t"), col("s"))
      .collect()
    rows.foreach { r =>
      val jvm = Hashing.md5LongJvm(r.getString(2))
      assert(r.getLong(0) === jvm && r.getLong(1) === jvm,
        s"hash spellings diverge on '${r.getString(2)}'")
    }
  }
}
