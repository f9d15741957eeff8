package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Hard-negative mining: an exact driver-side recomputation of the full
  * (eval, rank, neighbor, cosine) card at sf0.001, the structural
  * invariants (dense ranks, eval set excluded from candidates), and the
  * decontamination-disjointness contract — a pair the semantic
  * contamination pass flags can never be served as a training negative,
  * because both read the same threshold. */
class HardNegativesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"
  private val Tau = Similarity.ContamSemTau
  private val K = Similarity.HardNegK

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("sf0.001: the full card matches an exact driver-side brute-force recompute") {
    val vecs = Tables.embeddings(spark, Sf)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val norms = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val byId = vecs.toMap
    val evals = vecs.map(_._1).filter(id => id >= Similarity.EvalLo && id < Similarity.EvalHi)
    val corpus = vecs.map(_._1).filterNot(id => id >= Similarity.EvalLo && id < Similarity.EvalHi)
    val expected = (for {
      e <- evals
      scored = corpus.map(c => (c, dot(byId(e), byId(c)) / (norms(e) * norms(c))))
        .filter(_._2 < Tau)
        .sortBy { case (c, cos) => (-cos, c) }
        .take(K)
      ((c, cos), i) <- scored.zipWithIndex
    } yield (e, c, (i + 1).toLong, round6(cos))).toSet
    val got = Similarity.hardNegatives(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === expected)
  }

  test("sf0.001: ranks are dense 1..k per eval query and neighbors are unique") {
    val rows = Similarity.hardNegatives(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (e, g) =>
      assert(g.map(_._3).sorted.toSeq === (1L to g.length).toSeq, s"ranks not dense for eval $e")
      assert(g.map(_._2).distinct.length === g.length, s"duplicate neighbor for eval $e")
    }
    assert(rows.forall { case (_, n, _) =>
      n < Similarity.EvalLo || n >= Similarity.EvalHi
    }, "an eval vector leaked into the negatives")
  }

  test("sf0.001: disjoint from the semantic-contamination pairs at the shared threshold") {
    // contamination_semantic exposes (vec_id, best eval_id) pairs at
    // cos >= tau; the SAME pair must never appear as (eval_id, neighbor_id)
    val flagged = Similarity.contaminationSemantic(spark, Sf).collect()
      .map(r => (r.getLong(1), r.getLong(0))).toSet // (eval_id, vec_id)
    val negs = Similarity.hardNegatives(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged.intersect(negs).isEmpty)
    // and every served cosine sits under the bar (round-6 can touch it)
    assert(Similarity.hardNegatives(spark, Sf).collect()
      .forall(_.getDouble(3) <= Tau))
  }
}
