package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Phrase search ([[Ranking.phraseSearch]]): crafted goldens for the
  * adjacency-intersection semantics (overlapping self-matches,
  * repeated-term phrases, no false cross-doc or gapped matches), and
  * agreement with a driver-side sliding-window scan on the real corpus. */
class PhraseSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def search(docs: Seq[(Long, String)], phrase: Seq[String]): Set[(Long, Long)] = {
    import spark.implicits._
    Ranking.phraseSearchOf(docs.toDF("doc_id", "text"), phrase).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("crafted goldens: exact matches, overlaps, repeated terms, no gapped/cross-doc hits") {
    val docs = Seq(
      1L -> "the stream table hash joins the stream table hash again", // 2 hits
      2L -> "stream table nohash stream xtable hash",                  // gapped: 0 hits
      3L -> "stream table",                                            // truncated: 0 hits
      4L -> "a stream table hash b")                                   // 1 hit mid-doc
    assert(search(docs, Seq("stream", "table", "hash")) ===
      Set((1L, 1L), (1L, 6L), (4L, 1L)))
    // overlapping self-matches: "a a a a" with phrase "a a" hits at 0,1,2
    assert(search(Seq(5L -> "a a a a"), Seq("a", "a")) ===
      Set((5L, 0L), (5L, 1L), (5L, 2L)))
    // a single-term phrase degenerates to that term's postings
    assert(search(Seq(6L -> "x y x"), Seq("x")) === Set((6L, 0L), (6L, 2L)))
    // adjacency must not leak across documents sharing positions
    assert(search(Seq(7L -> "stream", 8L -> "table hash"),
      Seq("stream", "table", "hash")) === Set.empty)
  }

  test("matches a driver sliding-window scan on the real sf0.001 corpus") {
    val phrase = Ranking.PhraseTerms
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, text) =>
      val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toVector
      toks.indices.filter(i => i + phrase.length <= toks.length &&
        phrase.indices.forall(j => toks(i + j) == phrase(j)))
        .map(i => (id, i.toLong))
    }.toSet
    val got = Ranking.phraseSearch(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
  }

  test("oracle twin rejects terms outside the tokenizer alphabet (SQL-literal injection guard)") {
    // a quoting term could break — or inject into — the interpolated oracle
    // text; it also could never match a token, so rejection loses nothing
    intercept[IllegalArgumentException] {
      Ranking.phraseSearchSql(Seq("it's", "fine"))
    }
    intercept[IllegalArgumentException] {
      Ranking.phraseSearchSql(Seq("ok", "o' -- )"))
    }
    // the real vocabulary passes
    assert(Ranking.phraseSearchSql(Ranking.PhraseTerms).nonEmpty)
  }
}
