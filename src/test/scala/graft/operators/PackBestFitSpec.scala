package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Non-splitting size-class packing: the two invariants that define the
  * operator (no document splits; no non-oversize bin exceeds the token
  * capacity), the shelf structure (every non-final bin of a class is
  * full), a hand-computed crafted card, and the padding-vs-overflow
  * comparison against [[Sampling.packSequences]]' arrival-order layout
  * that motivates shipping both. */
class PackBestFitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"
  private val B = Sampling.PackBinTokens // 512

  test("crafted corpus: classes, bins, fills, pads, oversize — hand-computed") {
    import spark.implicits._
    // capacity 10: sizes 11 (oversize→class1), 6,6 (class1), 5 (class2),
    // 3,3,3,3 (class3), 2 (class5)
    val docs = Seq(
      (1L, "s", 11L), (2L, "s", 6L), (3L, "s", 6L), (4L, "s", 5L),
      (5L, "s", 3L), (6L, "s", 3L), (7L, "s", 3L), (8L, "s", 3L),
      (9L, "s", 2L), (10L, "s", 0L) // zero-token: dropped
    ).toDF("doc_id", "source", "n_tokens")
    val assign = Sampling.packBestFitAssign(docs, binTokens = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    // class 1 ranked size-desc: 11 → bin0, 6(doc2) → bin1, 6(doc3) → bin2
    assert(assign(1L) === ((1L, 0L)))
    assert(assign(2L) === ((1L, 1L)))
    assert(assign(3L) === ((1L, 2L)))
    // class 2: the lone 5-token doc
    assert(assign(4L) === ((2L, 0L)))
    // class 3: four 3-token docs → bin0 holds ranks 1-3, bin1 the fourth
    assert(Seq(5L, 6L, 7L).map(assign(_)) === Seq((3L, 0L), (3L, 0L), (3L, 0L)))
    assert(assign(8L) === ((3L, 1L)))
    // class 5: the 2-token doc
    assert(assign(9L) === ((5L, 0L)))
    assert(!assign.contains(10L), "zero-token docs must drop")
    // the registered per-bin card over the same frame
    val card = Sampling.packBestFitAssign(docs, binTokens = 10)
      .groupBy(col("source"), col("size_class"), col("bin_id"))
      .agg(sum(col("n_tokens")).as("fill")).collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(card === Map((1L, 0L) -> 11L, (1L, 1L) -> 6L, (1L, 2L) -> 6L,
      (2L, 0L) -> 5L, (3L, 0L) -> 9L, (3L, 1L) -> 3L, (5L, 0L) -> 2L))
  }

  test("invariants at sf0.001: no splits, hard capacity, shelf fullness, class law") {
    val docs = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    val rows = Sampling.packBestFitAssign(docs, B).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nPositive = docs.filter(col("n_tokens") > 0).count()
    // no splits: exactly one assignment row per packable doc
    assert(rows.length.toLong === nPositive)
    assert(rows.map(_._1).distinct.length === rows.length)
    // class law: size_class = max(1, B div n) for every row
    for ((_, _, n, k, _) <- rows) assert(k === math.max(1L, B / n))
    val bins = rows.groupBy(r => (r._2, r._4, r._5))
    for (((src, k, bin), members) <- bins) {
      val fill = members.map(_._3).sum
      // hard capacity: only a lone over-capacity doc may exceed B
      if (fill > B)
        assert(k === 1L && members.length === 1 && members.head._3 > B,
          s"($src,$k,$bin) overfilled with ${members.length} docs / $fill tokens")
      // membership bound: never more than k docs in a class-k bin
      assert(members.length <= k, s"($src,$k,$bin) holds ${members.length} > $k docs")
      // shelf fullness: every non-final bin of its (source, class) is full
      val lastBin = bins.keys.filter(x => x._1 == src && x._2 == k).map(_._3).max
      if (bin < lastBin)
        assert(members.length === k.toInt, s"($src,$k,$bin) not full but not final")
    }
    // determinism: a second evaluation bit-matches
    val again = Sampling.packBestFitAssign(docs, B).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.sortBy(_._1).toSeq === rows.sortBy(_._1).toSeq)
  }

  test("the trade vs pack_sequences: arrival-order offset bins overflow; this layout never does") {
    // pack_sequences assigns whole docs by arrival-order start offset, so a
    // doc straddling a boundary OVERFLOWS its bin (fine for its use — bin
    // targets are soft there); SFT packing needs the hard capacity and pays
    // padding instead. Quantify both on the real corpus.
    val seqBins = Sampling.packSequences(spark, Sf, B)
      .groupBy(col("source"), col("bin_id"))
      .agg(sum(col("n_tokens")).as("fill")).collect().map(_.getLong(2))
    val bfCard = Sampling.packBestFit(spark, Sf, B).collect()
      .map(r => (r.getLong(4), r.getLong(5), r.getBoolean(6)))
    val oversizeDocs = graft.Tables.documents(spark, Sf)
      .filter(size(TextOps.tokens(col("text"))) > B).count()
    assert(seqBins.exists(_ > B),
      "on this corpus the arrival-order layout must overflow somewhere — " +
        "otherwise the comparison is vacuous")
    // best-fit: every violation is an oversize singleton, counted exactly
    val violations = bfCard.filter(_._1 > B)
    assert(violations.length.toLong === oversizeDocs)
    assert(violations.forall(_._3), "every over-capacity bin must carry the oversize flag")
    assert(bfCard.filter(!_._3).forall(c => c._1 + c._2 === B.toLong),
      "fill + pad must reconstruct the capacity on every in-capacity bin")
  }
}
