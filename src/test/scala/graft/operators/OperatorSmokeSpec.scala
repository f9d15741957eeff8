package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Fast structural checks over every registered query at sf0.001: runs,
  * returns rows where expected, schema column names match what the oracle
  * SQL will produce (the driver's compare hashes columns by sorted name —
  * a rename breaks it even when values match). The full value-level check
  * is the Verify + DuckDB harness. */
class OperatorSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  // Queries where an empty result is semantically fine on this corpus.
  private val mayBeEmpty = Set("grep_product")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001 and returns rows") {
      val df = fn(spark, Sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has an oracle entry (full-strength correctness gate)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("entry() returns rows for the driver smoke check") {
    assert(SparkEntry.entry(SparkTestSession.spark).count() > 0)
  }

  test("vector dot expression matches a reference implementation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val got = df.select(graft.functions.VectorExpressions.vec_dot(col("a"), col("b")))
      .head().getDouble(0)
    assert(got === 32.0)
  }
}
