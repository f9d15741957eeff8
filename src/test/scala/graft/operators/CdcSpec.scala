package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Content-defined chunking dedup ([[Dedup.cdcChunkDedup]]): the chunk
  * contract is recomputed independently on the driver (md5LongJvm + plain
  * Scala fold) and compared chunk-for-chunk against the engine on the real
  * corpus; shift resistance — the property that justifies CDC over
  * fixed-size blocks — is proven on a crafted offset-duplicate pair, with
  * the fixed-size counterexample alongside. */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  private val D = Dedup.CdcDivisor
  private val M = Dedup.CdcModulus

  /** Independent JVM spelling of the chunk contract: tokenize, hash,
    * boundary where h % D == 0 (1-based, forced at doc end), fingerprint =
    * fold (acc*31 + h) % M seeded 0. */
  private def jvmChunks(text: String): Vector[(Long, Long)] = {
    val hs = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toVector
      .map(Hashing.md5LongJvm)
    if (hs.isEmpty) Vector.empty
    else {
      val bidx = (1 to hs.size).filter(i => hs(i - 1) % D == 0 || i == hs.size)
      (0 +: bidx.init).zip(bidx).toVector.map { case (prev, b) =>
        val fp = hs.slice(prev, b).foldLeft(0L)((acc, x) => (acc * 31 + x) % M)
        (fp, (b - prev).toLong)
      }
    }
  }

  private def fixedChunks(text: String, w: Int): Vector[Long] = {
    val hs = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toVector
      .map(Hashing.md5LongJvm)
    hs.grouped(w).map(_.foldLeft(0L)((acc, x) => (acc * 31 + x) % M)).toVector
  }

  test("engine chunks equal the driver recomputation on the whole sf0.001 corpus") {
    val docs = graft.Tables.documents(spark, Sf)
    val engine = Dedup.cdcChunksOf(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sorted.toVector).toMap
    val driver = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), jvmChunks(r.getString(1)).sorted))
      .filter(_._2.nonEmpty).toMap
    assert(engine.keySet === driver.keySet)
    for ((id, ch) <- driver) assert(engine(id) === ch, s"doc $id")
    assert(driver.valuesIterator.map(_.size).sum > driver.size,
      "corpus must produce multi-chunk docs for the test to bite")
  }

  test("shift resistance: an offset copy shares all but at most one chunk; fixed-size shares none") {
    import spark.implicits._
    // 64 deterministic tokens; B carries the SAME passage behind a
    // 3-token junk prefix — every content-defined boundary inside the
    // passage re-synchronizes, so only A's first chunk can differ.
    val passage = (1 to 64).map(i => s"tok${i}word").mkString(" ")
    val a = passage
    val b = s"zz1 zz2 zz3 $passage"
    val fpsA = jvmChunks(a).map(_._1)
    val fpsB = jvmChunks(b).map(_._1).toSet
    assert(fpsA.size >= 3, "passage must cut into several chunks")
    val shared = fpsA.count(fpsB.contains)
    assert(shared >= fpsA.size - 1,
      s"CDC must re-synchronize after the offset: shared $shared of ${fpsA.size}")
    // The fixed-size counterexample: 16-token blocks share NOTHING once
    // the passage is shifted by 3 tokens.
    assert(fixedChunks(a, 16).toSet.intersect(fixedChunks(b, 16).toSet).isEmpty,
      "fixed-size chunking defeats the test's premise")

    // End-to-end through the engine on the crafted corpus: the offset
    // pair detects each other; the unrelated doc stays clean.
    val docs = Seq((1L, a), (2L, b), (3L, (1 to 40).map(i => s"other${i}x").mkString(" ")))
      .toDF("doc_id", "text")
    val card = Dedup.cdcChunkDedupOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    assert(card(1L)._2 >= card(1L)._1 - 1, "doc 1: all but ≤1 chunk duplicated")
    assert(card(2L)._2 >= 1)
    assert(card(3L)._2 === 0L, "unrelated doc must carry zero dup chunks")
    assert(card(3L)._3 === 0L)
  }

  test("identical docs are fully duplicated (dup_ratio_ppm = 1000000)") {
    import spark.implicits._
    val text = (1 to 50).map(i => s"w${i}q").mkString(" ")
    val docs = Seq((10L, text), (11L, text)).toDF("doc_id", "text")
    val card = Dedup.cdcChunkDedupOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(card === Map(10L -> 1000000L, 11L -> 1000000L))
  }
}
