package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** The hashed-linear classifier gate: an exact driver recompute of the
  * whole card at sf0.001 through the JVM md5 twin (pinning bucket hashing,
  * weight derivation, and the shifted-mean arithmetic end to end), plus
  * crafted single-token corpora where the score is one hand-derivable
  * weight. */
class ClassifierGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"
  private val B = TextAnalysis.ClsBuckets
  private val W = TextAnalysis.ClsWRange

  /** Driver twin of the per-token weight: md5-bucket then md5-weight. */
  private def weightOf(tok: String): Long = {
    val b = Hashing.md5LongJvm(tok) % B
    (Hashing.md5LongJvm(s"w:$b") % (2 * W + 1)) - W
  }

  private def card(texts: Seq[(String, String, String)]): Map[(String, String), (Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    TextAnalysis.classifierGateOfDocs(texts.toDF("lang", "source", "text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
  }

  test("crafted: a one-token doc scores exactly its bucket weight; verdict is sign(score)") {
    val w = weightOf("alpha")
    val got = card(Seq(("en", "s1", "alpha"), ("en", "s1", "alpha alpha")))
    val (nDocs, kept, sumW, sumT, shifted) = got(("en", "s1"))
    assert(nDocs === 2L && sumW === 3 * w && sumT === 3L)
    assert(kept === (if (w > 0) 2L else 0L))
    // mean over the group: 1000*(3w + 1000*3)/3 = 1000*w + 1_000_000
    assert(shifted === 1000L * w + 1000000L)
  }

  test("crafted: weights depend on the token's BUCKET, not the token (hash-trick collisions share a weight)") {
    // find two distinct tokens that collide into one bucket
    val base = (0 until 20000).map(i => s"t$i")
    val byBucket = base.groupBy(t => Hashing.md5LongJvm(t) % B)
    val pair = byBucket.values.find(_.size >= 2).get
    assert(weightOf(pair(0)) === weightOf(pair(1)))
  }

  test("sf0.001: full card matches an exact driver recompute (BigInt shifted mean)") {
    val docs = Tables.documents(spark, Sf)
      .select("lang", "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val expected = docs.groupBy(d => (d._1, d._2)).map { case (k, ds) =>
      val perDoc = ds.map { d =>
        val toks = "[a-z0-9]+".r.findAllIn(d._3.toLowerCase).toSeq
        (toks.map(weightOf).sum, toks.length.toLong)
      }
      val sumW = perDoc.map(_._1).sum
      val sumT = perDoc.map(_._2).sum
      val shifted = (BigInt(1000) * (BigInt(sumW) + BigInt(W) * sumT) / sumT).toLong
      k -> ((ds.length.toLong, perDoc.count(_._1 > 0).toLong, sumW, sumT, shifted))
    }
    val got = TextAnalysis.classifierGate(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got === expected)
  }
}
