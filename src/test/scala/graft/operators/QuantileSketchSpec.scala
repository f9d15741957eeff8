package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The histogram quantile sketch's contract: every estimate is the upper
  * edge of the bin holding the exact rank statistic, so
  * `est − binWidth ≤ exact < est` against the exact window-sort twin
  * ([[TextAnalysis.lengthQuantiles]]), and the sketch is insensitive to
  * partition layout (its state merges by addition). */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  test("hist_quantiles: estimates bracket the exact quantiles within one bin width") {
    val W = TextAnalysis.HistBinWidth
    val est = TextAnalysis.histQuantiles(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val exact = TextAnalysis.lengthQuantiles(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (lang, (nDocs, p25, p50, p75)) =>
      val (n, e25, e50, e75) = est(lang)
      assert(n === nDocs)
      Seq((p25, e25, "p25"), (p50, e50, "p50"), (p75, e75, "p75")).foreach {
        case (ex, e, tag) =>
          assert(ex < e && ex >= e - W, s"$lang $tag: exact $ex outside [${e - W}, $e)")
      }
    }
    // quantile estimates are monotone in q
    est.values.foreach { case (_, e25, e50, e75) =>
      assert(e25 <= e50 && e50 <= e75)
    }
  }

  test("hist_quantiles: estimate is independent of partition layout (merge = addition)") {
    val docs = graft.Tables.documents(spark, Sf)
    val one = TextAnalysis.histQuantilesOfDocs(docs.repartition(1))
      .collect().map(_.toSeq).toSet
    val many = TextAnalysis.histQuantilesOfDocs(docs.repartition(13))
      .collect().map(_.toSeq).toSet
    assert(one === many)
    assert(one.nonEmpty)
  }
}
