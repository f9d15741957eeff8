package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Dominant-direction extraction: crafted spectra with known eigenstructure
  * (an axis-aligned one-line corpus, an isotropic two-axis pair) and an
  * exact driver-side replay of the full quantized power iteration at
  * sf0.001 — every v_ppm component and all three scalars must match the
  * distributed result bit-for-bit. */
class TopDirectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"
  private val D = Similarity.EmbeddingDim

  private def axis(d: Int, scale: Double): Seq[Double] =
    Seq.tabulate(D)(i => if (i == d) scale else 0.0)

  private def run(vecs: Seq[Seq[Double]]): Array[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    Similarity.embeddingTopDirectionOfVecs(spark, vecs.toDF("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
  }

  test("one-line corpus: the axis is recovered exactly, energy share 10^6") {
    val rows = run(Seq(axis(3, 2.0), axis(3, 3.0), axis(3, 1.0)))
    rows.foreach { case (dim, vppm, lambda, trace, ratio) =>
      assert(vppm === (if (dim == 3) 1000000L else 0L))
      assert(lambda === trace)
      assert(ratio === 1000000L)
    }
  }

  test("isotropic two-axis pair: the diagonal direction, half the energy") {
    val r = run(Seq(axis(0, 1.0), axis(1, 1.0)))
    val byDim = r.map(t => t._1 -> t._2).toMap
    // v3 = (1/sqrt2, 1/sqrt2, 0, ...): floor(0.7071…e6) = 707106
    assert(byDim(0L) === 707106L && byDim(1L) === 707106L)
    assert((2L until D.toLong).forall(byDim(_) === 0L))
    // two equal eigenvalues: the top direction carries exactly half
    val ratio = r.head._5
    assert(ratio >= 499000L && ratio <= 500000L, s"ratio_ppm $ratio")
  }

  test("sf0.001: the distributed card matches an exact driver replay of the quantized iteration") {
    val vecs = Tables.embeddings(spark, Sf)
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(_.getSeq[Double](0).toArray)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    var v = Array.fill(D)(0.125)
    for (_ <- 1 to Similarity.PowerIters) {
      val w = new Array[Long](D)
      vecs.foreach { x =>
        val p = dot(x, v)
        var d = 0
        while (d < D) { w(d) += math.floor(x(d) * p * 1000000d).toLong; d += 1 }
      }
      val wd = w.map(_.toDouble)
      var ss = 0.0; var i = 0
      while (i < D) { ss += wd(i) * wd(i); i += 1 }
      val nrm = math.sqrt(ss)
      v = wd.map(_ / nrm)
    }
    var lsum = 0L; var tsum = 0L
    vecs.foreach { x =>
      val p = dot(x, v)
      lsum += math.floor(p * p * 1000000d).toLong
      tsum += math.floor(dot(x, x) * 1000000d).toLong
    }
    val n = vecs.length
    val lambda = lsum / n; val trace = tsum / n
    val ratio = (1000000L * lambda) / math.max(trace, 1L)
    val expected = v.zipWithIndex.map { case (x, i) =>
      (i.toLong, math.floor(x * 1000000d).toLong, lambda, trace, ratio)
    }
    val got = Similarity.embeddingTopDirection(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq === expected.toSeq)
  }
}
