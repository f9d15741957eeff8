package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Lexical diversity: crafted endpoint distributions (all-identical and
  * all-distinct tokens), an exact BigInt recomputation of every fixed-point
  * column at sf0.001, and the Cauchy–Schwarz bounds that tie the Simpson
  * index to the type count. */
class TokenDiversitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"
  private val S = TextAnalysis.DivScale

  private def ofTexts(texts: Seq[(Long, String)]): Map[Long, (Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    TextAnalysis.tokenDiversityOfDocs(texts.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
  }

  test("crafted endpoints: all-identical vs all-distinct token distributions") {
    val p = ofTexts(Seq(1L -> "x x x x", 2L -> "a b c d", 3L -> ""))
    // 4 copies of one type: ttr 1/4, collision 1, effective types 1, top 1
    assert(p(1L) === ((4L, 1L, S / 4, S, S, S)))
    // 4 distinct types: ttr 1, collision 1/4, effective types 4, top 1/4
    assert(p(2L) === ((4L, 4L, S, S / 4, 4 * S, S / 4)))
    // zero-token docs carry no row (explode drops them; so does unnest)
    assert(!p.contains(3L))
  }

  test("sf0.001: every fixed-point column matches an exact BigInt recompute") {
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.flatMap { case (id, text) =>
      val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
      if (toks.isEmpty) None else {
        val counts = toks.groupBy(identity).map(_._2.length.toLong).toSeq
        val n = BigInt(counts.sum)
        val types = BigInt(counts.length)
        val sumsq = counts.map(c => BigInt(c) * c).sum
        val cmax = BigInt(counts.max)
        Some(id -> ((counts.sum, counts.length.toLong,
          (S * types / n).toLong, (S * sumsq / (n * n)).toLong,
          (S * n * n / sumsq).toLong, (S * cmax / n).toLong)))
      }
    }.toMap
    val got = TextAnalysis.tokenDiversity(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got === expected)
  }

  test("sf0.001: Cauchy–Schwarz bounds hold on every document") {
    val rows = TextAnalysis.tokenDiversity(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (types, ttr, simpson, eff, top) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(ttr > 0 && ttr <= S)
      // sum(c^2) >= n^2/types (equality iff uniform) and <= n^2
      assert(simpson >= S / types && simpson <= S)
      // inverse: 1 <= effective types <= types
      assert(eff >= S && eff <= types * S)
      // the top type carries at least the uniform share
      assert(top >= S / types && top <= S)
    }
  }
}
