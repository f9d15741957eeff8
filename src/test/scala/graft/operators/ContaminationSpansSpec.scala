package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ContaminationSpansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("islands: a shared run and an isolated hit count as separate spans with exact lengths") {
    import spark.implicits._
    val M = Curation.BenchmarkMod.toLong
    // Benchmark doc (id % 97 == 0) and one candidate. The candidate embeds
    // a verbatim 5-token excerpt ("q1..q5" → 3 consecutive contaminated
    // shingles) and, later, one isolated contaminated shingle
    // ("q1 q2 q3" appearing again out of context).
    val docs = Seq(
      (0L, "q1 q2 q3 q4 q5 x1 x2 x3"), // benchmark member
      (1L, "a1 a2 q1 q2 q3 q4 q5 b1 b2 b3 b4 q1 q2 q3 c1 c2")
    ).toDF("doc_id", "text")
    assert(1L % M > 0L) // doc 1 is not a benchmark member
    val rows = Curation.contaminationSpansOfDocs(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // Doc 1: positions 2..4 hit (the excerpt's 3 shingles) and position 11
    // hits ("q1 q2 q3") → 2 spans, longest 3, 4 contaminated positions.
    assert(rows === Map(1L -> ((2L, 3L, 4L))))
  }

  test("dupSpans: both copies of a shared excerpt span; unique docs absent") {
    import spark.implicits._
    // Docs 1 and 2 share a verbatim 5-token excerpt ("s1..s5" → 3
    // consecutive shared shingles); doc 3 is entirely unique. Unlike
    // contamination, BOTH holders of the duplicate are reported.
    val docs = Seq(
      (1L, "a1 a2 s1 s2 s3 s4 s5 a3"),
      (2L, "s1 s2 s3 s4 s5 b1 b2 b3"),
      (3L, "u1 u2 u3 u4 u5 u6")
    ).toDF("doc_id", "text")
    val rows = Curation.dupSpansOfDocs(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // Each copy: one span of the 3 excerpt shingles (positions 2..4 / 0..2).
    assert(rows === Map(1L -> ((1L, 3L, 3L)), 2L -> ((1L, 3L, 3L))))
  }

  test("dupSpans: a shingle repeated only WITHIN one doc is not a duplicate") {
    import spark.implicits._
    // "r1 r2 r3" occurs twice in doc 1 but nowhere else — document
    // frequency 1, so self-repetition alone must not flag spans.
    val docs = Seq(
      (1L, "r1 r2 r3 x1 x2 r1 r2 r3"),
      (2L, "y1 y2 y3 y4 y5")
    ).toDF("doc_id", "text")
    assert(Curation.dupSpansOfDocs(docs).count() === 0)
  }

  test("uncontaminated docs and the benchmark itself are absent") {
    import spark.implicits._
    val docs = Seq(
      (0L, "q1 q2 q3 q4"),
      (1L, "z1 z2 z3 z4 z5")
    ).toDF("doc_id", "text")
    assert(Curation.contaminationSpansOfDocs(docs).count() === 0)
  }
}
