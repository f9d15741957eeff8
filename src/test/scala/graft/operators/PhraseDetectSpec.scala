package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Collocation detection ([[TextAnalysis.phraseDetect]]): the word2vec
  * phrase rule is exercised on a crafted corpus where each verdict class is
  * falsified by construction — a true collocation, a frequent-but-chance
  * adjacency, and a pair the δ discount kills — then the full top-50 frame
  * is recomputed independently on the driver (BigInt cross-multiplication)
  * over the real sf0.001 corpus. */
class PhraseDetectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  test("phrase rule: collocation passes, chance adjacency fails, delta kills rare pairs (crafted)") {
    import spark.implicits._
    // 20 docs carry "new york" as a true collocation; "the" floods the
    // corpus (so "the cat" is frequent but expected by chance); "foo bar"
    // appears exactly delta times so the discount zeroes it.
    val docs =
      Seq.tabulate(20)(i => s"new york f${i}a f${i}b f${i}c f${i}d f${i}e f${i}f the q${i}c the q${i}d the") ++
      Seq.tabulate(6)(i => s"the cat g${i}e the g${i}f the g${i}g") ++
      Seq.tabulate(5)(i => s"foo bar h${i}k the h${i}m the h${i}n")
    val got = TextAnalysis.phraseDetectOf(docs.toDF("text")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(6))).toMap
    val ny = got(("new", "york"))
    assert(ny._1 === 20L && ny._4 === 1L, s"'new york' must be a phrase: $ny")
    val cat = got(("the", "cat"))
    assert(cat._1 === 6L && cat._4 === 0L,
      s"'the cat' is chance adjacency of a flood word, not a phrase: $cat")
    val foo = got(("foo", "bar"))
    assert(foo._1 === 5L && foo._4 === 0L,
      s"'foo bar' at exactly delta occurrences must be discounted away: $foo")
  }

  test("top-50 frame equals a driver recomputation on the real sf0.001 corpus") {
    val texts = graft.Tables.documents(spark, Sf)
      .select("text").collect().map(_.getString(0))
    val tok = texts.map(t => "[a-z0-9]+".r.findAllIn(t.toLowerCase).toVector)
      .filter(_.nonEmpty)
    val uni = tok.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTotal = uni.values.sum
    val bi = tok.filter(_.size >= 2)
      .flatMap(t => t.zip(t.tail)).groupBy(identity).view.mapValues(_.size.toLong)
    val topk = bi.toVector
      .sortBy { case ((wa, wb), c) => (-c, wa, wb) }.take(TextAnalysis.PhraseTopK)
    val want = topk.map { case ((wa, wb), cab) =>
      val (ca, cb) = (uni(wa), uni(wb))
      val pass = (BigInt(cab) - TextAnalysis.PhraseDelta) * nTotal >=
        BigInt(TextAnalysis.PhraseThreshold) * ca * cb
      (wa, wb, cab, ca, cb, nTotal, if (pass) 1L else 0L)
    }.toSet
    val got = TextAnalysis.phraseDetect(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got === want)
    assert(got.size === TextAnalysis.PhraseTopK)
  }
}
