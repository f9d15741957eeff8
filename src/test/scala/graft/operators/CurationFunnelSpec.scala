package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** The attrition funnel: document conservation (every doc attributed to
  * exactly one stage), monotonicity, first-failing-gate attribution under
  * threshold extremes, the ppm arithmetic, and the reconciliation that
  * defines the card — its final survivor count IS the flagship gate
  * chain's pre-quota kept set. */
class CurationFunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  /** stage_id -> (n_docs, n_tokens, dropped, survived_ppm) */
  private def funnel(minQ: Double = 0.5, maxRep: Double = 0.1,
      maxContam: Double = 0.1): Map[Long, (Long, Long, Long, Long)] =
    Curation.curationFunnel(spark, Sf, minQ, maxRep, maxContam).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

  test("conservation and monotonicity: every doc lands in exactly one stage") {
    val f = funnel()
    assert(f.keySet === Set(0L, 1L, 2L, 3L, 4L))
    val raw = f(0L)._1
    assert(raw > 0)
    // dropped across gate stages + final survivors == raw
    assert((1L to 4L).map(f(_)._3).sum + f(4L)._1 === raw)
    // survivors and token volume never increase along the chain
    (0L to 3L).foreach { k =>
      assert(f(k)._1 >= f(k + 1)._1, s"doc count rose at stage ${k + 1}")
      assert(f(k)._2 >= f(k + 1)._2, s"token volume rose at stage ${k + 1}")
    }
    // ppm is the floored survivor fraction of the raw corpus
    (0L to 4L).foreach { k =>
      assert(f(k)._4 === 1000000L * f(k)._1 / raw)
    }
  }

  test("final survivors reconcile with the flagship gate chain (pre-quota kept set)") {
    val docs = Tables.documents(spark, Sf).select(col("doc_id"))
    val q = TextAnalysis.quality(spark, Sf).select(col("doc_id"), col("quality_score"))
    val rep = Curation.repetition(spark, Sf).select(col("doc_id"), col("top_bigram_frac"))
    val contam = Curation.contamination(spark, Sf).select(col("doc_id"), col("contamination_frac"))
    val nonCanonical = Dedup.clusters(spark, Sf)
      .filter(col("doc_id") =!= col("cluster_id")).select(col("doc_id"))
    val kept = docs
      .join(q, Seq("doc_id")).filter(col("quality_score") >= 0.5)
      .join(rep, Seq("doc_id")).filter(col("top_bigram_frac") <= 0.1)
      .join(contam, Seq("doc_id")).filter(col("contamination_frac") <= 0.1)
      .join(nonCanonical, Seq("doc_id"), "left_anti")
      .count()
    assert(funnel()(4L)._1 === kept)
  }

  test("first-failing-gate attribution: an impossible quality bar drains the funnel at stage 1") {
    val f = funnel(minQ = 2.0)
    val raw = f(0L)._1
    assert(f(1L) === ((0L, 0L, raw, 0L)))
    (2L to 4L).foreach(k => assert(f(k) === ((0L, 0L, 0L, 0L))))
  }

  test("first-failing-gate attribution: an impossible repetition bar drops exactly the quality survivors") {
    val base = funnel()
    val f = funnel(maxRep = -1.0)
    // stage 1 is unchanged; everything that survived it dies at stage 2
    assert(f(1L) === base(1L))
    assert(f(2L)._3 === f(1L)._1)
    assert(f(2L)._1 === 0L && f(4L)._1 === 0L)
  }
}
