package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  private def counts(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def ofEdges(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    counts(Curation.trianglesOfPairs(edges.toDF("doc_a", "doc_b")))
  }

  test("crafted graphs: K4, square, and a hub star") {
    // K4 = 4 triangles, every node in 3 of them.
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(ofEdges(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // A 4-cycle has no triangle at all.
    assert(ofEdges(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))) === Map.empty)
    // A star (hub with leaves) has wedges but no closing edges; adding ONE
    // leaf-leaf edge closes exactly one triangle.
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(ofEdges(star) === Map.empty)
    assert(ofEdges(star :+ (2L, 3L)) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("degree-ordered enumeration equals naive enumeration on the winnow graph") {
    val pairs = Curation.winnowPairs(spark, Sf)
      .select(col("doc_a").as("a"), col("doc_b").as("b")).localCheckpoint()
    val naive = pairs.as("e1")
      .join(pairs.as("e2"), col("e2.a") === col("e1.b"))
      .join(pairs.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val naivePerDoc = naive
      .select(explode(array(col("x"), col("y"), col("z"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_triangles"))
    val fast = Curation.trianglesOfPairs(
      pairs.select(col("a").as("doc_a"), col("b").as("doc_b")))
    assert(counts(fast) === counts(naivePerDoc))
  }

  test("clustering coefficient: clique nodes score 1.0, path centers 0, leaves are excluded") {
    import spark.implicits._
    def coeffs(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
      Curation.clusteringCoeffOfPairs(edges.toDF("doc_a", "doc_b")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(coeffs(k4) ===
      (1L to 4L).map(_ -> ((3L, 3L, Curation.CoeffScale))).toMap)
    // Path a-b-c: b has degree 2 and no triangle → coefficient 0; the
    // degree-1 endpoints have no defined coefficient and are excluded.
    assert(coeffs(Seq((1L, 2L), (2L, 3L))) === Map(2L -> ((2L, 0L, 0L))))
  }
}
