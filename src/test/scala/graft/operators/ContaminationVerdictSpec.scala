package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The composite decontamination verdict: each of the three signals must be
  * able to flip a document's keep/drop INDEPENDENTLY (the policy is an OR —
  * a signal that can't flip it contributes nothing), thresholds are
  * inclusive, missing signals coalesce to typed zeros, and the registered
  * query equals a driver-side recomposition of the three registered signal
  * queries on real data. */
class ContaminationVerdictSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  private def run(docIds: Seq[Long], frac: Seq[(Long, Double)],
      spans: Seq[(Long, Long)], sem: Seq[(Long, Double)],
      fracTau: Double = 0.1, spanTau: Long = 3L) = {
    import spark.implicits._
    val docs = docIds.toDF("doc_id")
    val fracDf = frac.map { case (d, f) => (d, 10L, 1L, f) }
      .toDF("doc_id", "n_shingles", "n_contaminated", "contamination_frac")
    val spansDf = spans.map { case (d, m) => (d, 1L, m, m) }
      .toDF("doc_id", "n_spans", "max_span", "n_contaminated_pos")
    val semDf = sem.map { case (d, c) => (d, 130L, c) }
      .toDF("vec_id", "eval_id", "cos_sim")
    Curation.contaminationVerdictOf(docs, fracDf, spansDf, semDf, fracTau, spanTau)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
  }

  test("each signal independently flips the verdict; boundaries are inclusive") {
    val out = run(
      docIds = Seq(1L, 2L, 3L, 4L, 5L, 6L, 97L), // 97 ≡ 0 mod 97: benchmark, excluded
      frac = Seq(1L -> 0.1, 5L -> 0.099999), // 1: exactly at tau; 5: just under
      spans = Seq(2L -> 3L, 6L -> 2L), // 2: exactly at tau; 6: under
      sem = Seq(3L -> 0.42)) // any semantic row = hit
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L), "benchmark doc must be excluded")
    assert(out(1L)._4, "frac >= tau alone must drop")
    assert(out(2L)._4, "span >= tau alone must drop")
    assert(out(3L)._4, "a semantic hit alone must drop")
    assert(!out(4L)._4 && !out(5L)._4 && !out(6L)._4, "sub-threshold docs keep")
    // the card carries each signal's value, zeros where a signal is absent
    assert(out(1L) === ((0.1, 0L, 0.0, true)))
    assert(out(2L) === ((0.0, 3L, 0.0, true)))
    assert(out(3L) === ((0.0, 0L, 0.42, true)))
    assert(out(4L) === ((0.0, 0L, 0.0, false)))
  }

  test("a doc invisible to the n-gram path (no shingles) is still droppable semantically") {
    // under-3-token docs produce NO frac/spans rows — exactly the paraphrase
    // case the semantic signal exists for
    val out = run(docIds = Seq(10L), frac = Seq.empty, spans = Seq.empty,
      sem = Seq(10L -> 0.55))
    assert(out(10L) === ((0.0, 0L, 0.55, true)))
  }

  test("registered query equals a driver-side recomposition of the three signals at sf0.001") {
    val frac = Curation.contamination(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val spans = Curation.contaminationSpans(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sem = Similarity.contaminationSemantic(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val docs = graft.Tables.documents(spark, Sf).select(col("doc_id"))
      .collect().map(_.getLong(0)).filter(_ % Curation.BenchmarkMod != 0)
    val want = docs.map { d =>
      val f = frac.getOrElse(d, 0.0)
      val s = spans.getOrElse(d, 0L)
      val c = sem.getOrElse(d, 0.0)
      d -> ((f, s, c,
        f >= Curation.VerdictFracTau || s >= Curation.VerdictSpanTau || sem.contains(d)))
    }.toMap
    val got = Curation.contaminationVerdict(spark, Sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got === want)
    assert(got.nonEmpty && got.values.exists(_._4), "some doc must drop at sf0.001")
    assert(got.values.exists(v => !v._4), "some doc must keep at sf0.001")
  }
}
