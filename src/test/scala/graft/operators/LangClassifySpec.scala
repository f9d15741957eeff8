package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class LangClassifySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def confusion(rows: (Long, String, String)*): Map[(String, String), Long] = {
    import spark.implicits._
    TextAnalysis.langClassifyOfDocs(rows.toDF("doc_id", "lang", "text"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  test("disjoint vocabularies classify perfectly (pure diagonal)") {
    val got = confusion(
      (1L, "aa", "alpha beta gamma alpha"), (2L, "aa", "beta gamma beta"),
      (3L, "bb", "delta epsilon zeta"), (4L, "bb", "epsilon delta delta"))
    assert(got === Map(("aa", "aa") -> 2L, ("bb", "bb") -> 2L))
  }

  test("a doc dominated by the OTHER class's tokens is pulled across (model, not echo)") {
    // Class labels say 'aa', but doc 5's text is wholly class-bb vocabulary
    // learned from bb's other docs — the trained likelihoods must beat the
    // doc's own label. Guards against any implementation that leaks the
    // label into scoring.
    val got = confusion(
      (1L, "aa", "alpha beta gamma alpha beta"),
      (2L, "aa", "alpha gamma gamma beta alpha"),
      (3L, "bb", "delta epsilon zeta zeta delta epsilon"),
      (4L, "bb", "delta delta epsilon zeta zeta"),
      (5L, "aa", "delta epsilon zeta delta"))
    assert(got(("aa", "bb")) === 1L)
    assert(got(("aa", "aa")) === 2L)
    assert(got(("bb", "bb")) === 2L)
  }
}
