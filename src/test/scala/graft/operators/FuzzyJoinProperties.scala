package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** Randomized exactness for the SymSpell deletion-neighborhood join: on
  * arbitrary short-alphabet string sets (small alphabet forces dense
  * near-collisions — substitutions, insertions, deletions, transposition
  * traps like ab/ba), the candidate scheme + exact verify must equal the
  * naive all-pairs `levenshtein <= 1` join. */
object FuzzyJoinProperties extends Properties("graft.fuzzyjoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark

  // Alphabet {a,b,c}, lengths 0..6: edit-distance-1 neighborhoods overlap
  // heavily, and empty/1-char strings exercise the deletion edge cases.
  private val nameGen: Gen[String] =
    Gen.choose(0, 6).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))

  property("deletion-neighborhood join equals the naive cross join") =
    forAll(Gen.choose(2, 25).flatMap(n => Gen.listOfN(n, nameGen))) { names =>
      import spark.implicits._
      val recs = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "name").localCheckpoint()
      val fast = FuzzyJoin.fuzzyPairsOn(recs)
        .select("id_a", "id_b", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val naive = recs.as("a").crossJoin(recs.as("b"))
        .filter(col("a.id") < col("b.id"))
        .withColumn("dist", levenshtein(col("a.name"), col("b.name")).cast("long"))
        .filter(col("dist") <= 1)
        .select(col("a.id"), col("b.id"), col("dist")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      fast == naive
    }
}
