package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("prefix-filtered jaccard is exact vs the full inverted-index join (t=0.8)") {
    val fast = resultSet(Dedup.ngramJaccard(spark, Sf, 0.8))
    val naive = resultSet(Dedup.ngramJaccardNaive(spark, Sf, 0.8))
    assert(fast === naive)
    assert(fast.nonEmpty) // the corpus has near-dup pairs at 0.8
  }

  test("prefix-filtered jaccard is exact at a looser threshold (t=0.5, more pairs)") {
    val fast = resultSet(Dedup.ngramJaccard(spark, Sf, 0.5))
    val naive = resultSet(Dedup.ngramJaccardNaive(spark, Sf, 0.5))
    assert(fast === naive)
    assert(fast.size >= resultSet(Dedup.ngramJaccard(spark, Sf, 0.8)).size)
  }

  test("minhash-LSH candidates cover every true jaccard>=0.9 pair (recall sanity)") {
    val lsh = Dedup.minhashLsh(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val strong = resultSet(Dedup.ngramJaccardNaive(spark, Sf, 0.9)).map(t => (t._1, t._2))
    // With 4 bands × 4 rows, P(candidate | J=0.9) = 1-(1-0.9^4)^4 ≈ 0.98;
    // on this corpus every strong pair should surface.
    assert(strong.subsetOf(lsh), s"missed: ${strong -- lsh}")
  }
}
