package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Total-variation domain-shift card: crafted corpora where TV is exact by
  * hand (identical source distributions → 0; two disjoint equal-mass
  * sources → 1/2), the absent-vocabulary algebra against a materialized
  * zero-row recompute, and a full BigInt recompute at sf0.001. */
class SourceDivergenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"
  private val S = TextAnalysis.TvScale

  private def card(rows: Seq[(String, String)]): Map[String, (Long, Long, Long)] = {
    import spark.implicits._
    TextAnalysis.sourceDivergenceOfDocs(rows.toDF("source", "text"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("crafted: sources with identical distributions sit at TV = 0") {
    val got = card(Seq("s1" -> "a a b", "s2" -> "a a b", "s3" -> "a a b"))
    got.values.foreach { case (n, v, tv) =>
      assert(n === 3L && v === 2L && tv === 0L)
    }
  }

  test("crafted: two disjoint equal-mass sources sit at TV = 1/2 each") {
    val got = card(Seq("s1" -> "a b c d", "s2" -> "w x y z"))
    assert(got("s1") === ((4L, 4L, S / 2)))
    assert(got("s2") === ((4L, 4L, S / 2)))
  }

  /** Driver reference: TV over the EXPLICIT joint distribution, zeros
    * materialized — the definition the absent-term algebra must equal. */
  private def tvRef(rows: Seq[(String, String)]): Map[String, Long] = {
    val toks = rows.flatMap { case (s, t) =>
      "[a-z0-9]+".r.findAllIn(t.toLowerCase).map(s -> _)
    }
    val vocab = toks.map(_._2).distinct
    val bySrc = toks.groupBy(_._1)
    val corpus = toks.groupBy(_._2).map { case (t, xs) => t -> BigInt(xs.length) }
    val nc = BigInt(toks.length)
    bySrc.map { case (src, xs) =>
      val tf = xs.groupBy(_._2).map { case (t, ys) => t -> BigInt(ys.length) }
      val ns = BigInt(xs.length)
      val num = vocab.map { t =>
        (tf.getOrElse(t, BigInt(0)) * nc - corpus(t) * ns).abs
      }.sum
      src -> (BigInt(S) * num / (2 * ns * nc)).toLong
    }
  }

  test("crafted skewed mixture: absent-term algebra equals the zero-materializing reference") {
    val rows = Seq(
      "s1" -> "a a a b c", "s1" -> "b b d",
      "s2" -> "a e e e", "s2" -> "f",
      "s3" -> "a b c d e f g h")
    val expected = tvRef(rows)
    val got = card(rows).map { case (s, (_, _, tv)) => s -> tv }
    assert(got === expected)
  }

  test("sf0.001: full card matches the exact BigInt recompute") {
    val rows = Tables.documents(spark, Sf).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val expectedTv = tvRef(rows)
    val got = TextAnalysis.sourceDivergence(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === expectedTv.keySet)
    got.foreach { case (s, (n, v, tv)) =>
      val toks = rows.filter(_._1 == s).flatMap(r => "[a-z0-9]+".r.findAllIn(r._2.toLowerCase))
      assert(n === toks.length.toLong)
      assert(v === toks.distinct.length.toLong)
      assert(tv === expectedTv(s))
    }
  }
}
