package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select(col("id_a"), col("id_b"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("deletion-neighborhood join equals the naive cross join (exactness)") {
    val cust = Tables.customer(spark, Sf)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val naive = cust.as("a").crossJoin(cust.as("b"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("dist", levenshtein(col("a.name"), col("b.name")).cast("long"))
      .filter(col("dist") <= 1)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("dist"))
    val fast = FuzzyJoin.fuzzyPairs(spark, Sf)
    assert(pairSet(fast) === pairSet(naive))
    assert(fast.count() > 0) // the corpus actually has near-miss names
  }

  test("catches substitutions, insertions, and deletions; rejects distance 2") {
    import spark.implicits._
    val recs = Seq(
      (1L, "widget"), // base
      (2L, "widgets"), // insertion at the end → dist 1
      (3L, "widget"), // exact duplicate → dist 0
      (4L, "wdget"), // deletion → dist 1
      (5L, "wadget"), // substitution → dist 1
      (6L, "gadget"), // dist 2 from widget — must NOT pair with 1
      (7L, "ab"),
      (8L, "ba") // shares deletion variants with 7 but dist 2 — candidate pruned by the exact check
    ).toDF("id", "name")
    val got = pairSet(FuzzyJoin.fuzzyPairsOn(recs))
    val gotPairs = got.map(t => (t._1, t._2))
    assert(got.contains((1L, 2L, 1L)))
    assert(got.contains((1L, 3L, 0L)))
    assert(got.contains((1L, 4L, 1L)))
    assert(got.contains((1L, 5L, 1L)))
    assert(!gotPairs.contains((1L, 6L)))
    assert(!gotPairs.contains((7L, 8L)))
  }

  test("entity resolution merges transitive chains a~b~c into one entity") {
    import spark.implicits._
    // wdgt ~ widgt ~ widget: the ends differ by 2 edits, so NO pairwise
    // match connects them directly — only the component walk can.
    val pairs = FuzzyJoin.fuzzyPairsOn(
      Seq((1L, "wdgt"), (2L, "widgt"), (3L, "widget"), (4L, "bolt"))
        .toDF("id", "name"))
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val cc = Dedup.clustersOfPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.get(1L) === Some(1L) && cc.get(2L) === Some(1L) && cc.get(3L) === Some(1L))
    assert(!cc.contains(4L)) // no fuzzy neighbor → not in the pair graph

    // The registered query's shape on real data: every part row accounted
    // for exactly once across entities.
    val ents = FuzzyJoin.entityResolution(spark, Sf)
    val totalParts = ents.agg(sum(col("n_parts"))).first().getLong(0)
    assert(totalParts === graft.Tables.part(spark, Sf).count())
  }
}
