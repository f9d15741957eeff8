package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[TextAnalysis.gopherGate]] — each published rule falsified by exactly
  * the crafted document built to break it, plus corpus-level invariants. */
class GopherGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  private def gate(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    TextAnalysis.gopherGateOfDocs(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
  }

  test("each rule fails on exactly its crafted violator; the clean doc keeps") {
    val pass60 = ("the cat sat on a mat " + Seq.fill(54)("word").mkString(" ")).trim
    val docs = Seq(
      1L -> pass60,                                          // all rules pass
      2L -> "the a short doc",                               // < 50 words
      3L -> ("the a " + Seq.fill(58)("x").mkString(" ")),    // mean len < 3
      4L -> (pass60 + " " + "@" * 20),                       // symbols > n/10
      5L -> Seq.fill(60)("word").mkString(" "),              // no stopwords
      6L -> ("the a " + Seq.fill(29)("word").mkString(" ")   // 29 alpha + 29 numeric
        + " " + Seq.fill(29)("42").mkString(" ")))           // of 60 → alpha < 80%
    val g = gate(docs)
    assert(g(1L) === ((1L, 1L, 1L, 1L, 1L, 1L)))
    assert(g(2L) === ((0L, 1L, 1L, 1L, 1L, 0L)), s"short doc: ${g(2L)}")
    assert(g(3L)._2 === 0L, s"one-char words must fail mean length: ${g(3L)}")
    assert(g(3L)._4 === 1L, "…while its stopwords still pass")
    assert(g(4L)._3 === 0L, s"symbol flood must fail the symbol rule: ${g(4L)}")
    assert(g(5L) === ((1L, 1L, 1L, 0L, 1L, 0L)), s"stopword-free doc: ${g(5L)}")
    assert(g(6L)._5 === 0L, s"numeric flood must fail the alpha rule: ${g(6L)}")
    // keep is exactly the AND of the five flags, for every crafted doc
    g.values.foreach { case (a, b, c, d, e, k) => assert(k === a * b * c * d * e) }
  }

  test("corpus run: flags are 0/1, keep is the AND, and both kept and dropped docs exist") {
    val rows = TextAnalysis.gopherGate(spark, Sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, c, d, e, k) =>
      Seq(a, b, c, d, e, k).foreach(f => assert(f == 0L || f == 1L))
      assert(k === a * b * c * d * e)
    }
    assert(rows.exists(_._6 == 1L), "some corpus docs must pass the gate")
    assert(rows.exists(_._6 == 0L), "some corpus docs must fail the gate")
  }
}
