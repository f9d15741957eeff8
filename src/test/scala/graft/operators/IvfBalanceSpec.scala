package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** IVF balance audit: conservation (every vector in exactly one bucket),
  * the load-ppm arithmetic against a driver recompute, cosine-band
  * ordering per cluster, and an exact driver replay of the whole card at
  * sf0.001 with the assignment's own tie rules. */
class IvfBalanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"
  private val C = Similarity.NumCentroids

  private def card(): Array[(Long, Long, Long, Long, Long, Long)] =
    Similarity.ivfBalance(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)

  test("conservation and arithmetic: buckets partition the corpus; load is the uniform-share ratio") {
    val rows = card()
    val total = Tables.embeddings(spark, Sf).count()
    assert(rows.map(_._2).sum === total)
    rows.foreach { case (cl, n, load, mn, mean, mx) =>
      assert(load === (BigInt(1000000) * n * C / total).toLong, s"load_ppm wrong for cluster $cl")
      assert(mn <= mean && mean <= mx, s"cosine band violated for cluster $cl")
    }
    // a centroid is its own nearest centroid at cosine 1: its bucket's max
    // must sit at the fixed-point top
    assert(rows.forall(_._6 <= 1000000L))
    assert(rows.exists(_._6 === 1000000L))
  }

  test("sf0.001: the full card matches an exact driver replay of the assignment") {
    val vecs = Tables.embeddings(spark, Sf)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val norms = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val cents = vecs.filter(_._1 < C)
    val assigned = vecs.map { case (id, v) =>
      // argmax cosine, ties to the lowest cent_id — max_by((cos, -cent))
      val (bestCent, bestCos) = cents.map { case (cid, cv) =>
        (cid, dot(v, cv) / (norms(id) * norms(cid)))
      }.maxBy { case (cid, cos) => (cos, -cid) }
      (bestCent, math.floor(bestCos * 1000000d).toLong)
    }
    val total = assigned.length.toLong
    val expected = assigned.groupBy(_._1).toSeq.map { case (cl, g) =>
      val fps = g.map(_._2)
      (cl, g.length.toLong,
        (BigInt(1000000) * g.length * C / total).toLong,
        fps.min, fps.sum / g.length, fps.max)
    }.sortBy(_._1).toArray
    assert(card().toSeq === expected.toSeq)
  }
}
