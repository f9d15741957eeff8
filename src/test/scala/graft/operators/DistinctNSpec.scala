package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[TextAnalysis.distinctN]] — diversity separates a templated source from
  * a diverse one, and every count matches a driver recomputation. */
class DistinctNSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("templated source scores far below a diverse one; counts are exact") {
    import spark.implicits._
    val template = "alpha beta gamma delta epsilon zeta eta theta"
    val docs =
      (1L to 20L).map(i => (i, template, "templated")) ++
        (21L to 40L).map(i => (i,
          (0 until 8).map(j => s"w${i}_$j").mkString(" "), "diverse"))
    val df = docs.toDF("doc_id", "text", "source")
    val got = TextAnalysis.distinctNOfDocs(df).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // driver ground truth
    def gramsOf(text: String, n: Int): Seq[String] = {
      val t = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
      if (t.length < n) Seq.empty else t.sliding(n).map(_.mkString(" ")).toSeq
    }
    for (src <- Seq("templated", "diverse"); n <- 1L to 3L) {
      val all = docs.filter(_._3 == src).flatMap(d => gramsOf(d._2, n.toInt))
      val want = (all.size.toLong, all.distinct.size.toLong,
        all.distinct.size.toLong * 1000000L / all.size)
      assert(got((src, n)) === want, s"($src, $n)")
    }
    // the metric's point: the templated source's distinct-2 ppm is a tiny
    // fraction of the diverse source's (every doc repeats the same bigrams)
    assert(got(("templated", 2L))._3 * 10 < got(("diverse", 2L))._3)
    assert(got(("diverse", 2L))._3 === 1000000L, "fully unique bigrams → ppm = 1e6")
  }
}
