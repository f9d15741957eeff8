package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** epoch_reshuffle: every epoch must read the corpus in a DIFFERENT
  * deterministic order, derived from the stored bytes alone. The spec
  * recomputes shard and rank from the portable md5 hash on the driver,
  * checks positions are dense within (epoch, shard), and asserts the
  * cross-epoch permutations actually differ — the property that separates
  * this operator from shard_assign's single fixed permutation. */
class EpochReshuffleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("shards/ranks replay the salted md5 permutation; positions dense per (epoch, shard)") {
    val rows = Sampling.epochReshuffle(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // (doc_id, epoch, shard, pos)
    val docIds = rows.map(_._1).distinct
    assert(rows.length === docIds.length * Sampling.ReshuffleEpochs,
      "every doc appears exactly once per epoch")
    rows.foreach { case (id, e, shard, _) =>
      val expected = Hashing.md5LongJvm(s"e$e:$id") % Sampling.NumShards
      assert(shard === expected, s"doc $id epoch $e shard disagrees with the salted hash")
    }
    rows.groupBy(r => (r._2, r._3)).foreach { case ((e, sh), grp) =>
      assert(grp.map(_._4).sorted.toSeq === (1L to grp.length).toSeq,
        s"positions must be dense 1..n within epoch $e shard $sh")
      // rank order = ascending salted md5 hex, tie-break doc_id (none expected)
      val expectedOrder = grp.map(_._1).sortBy(id => (md5Hex(s"e$e:$id"), id))
      assert(grp.sortBy(_._4).map(_._1).toSeq === expectedOrder.toSeq,
        s"within-shard order must be the salted md5 permutation (epoch $e shard $sh)")
    }
  }

  test("epochs are genuinely different permutations of the same corpus") {
    val rows = Sampling.epochReshuffle(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val orders = (0L until Sampling.ReshuffleEpochs.toLong).map { e =>
      rows.filter(_._2 == e).sortBy(r => (r._3, r._4)).map(_._1).toSeq
    }
    // same doc multiset every epoch...
    orders.tail.foreach(o => assert(o.sorted === orders.head.sorted))
    // ...but never the same order (the anti-correlation property)
    for (i <- orders.indices; j <- orders.indices if i < j)
      assert(orders(i) != orders(j), s"epochs $i and $j replayed the same order")
    // and deterministic: a second evaluation reproduces epoch 0 exactly
    val again = Sampling.epochReshuffle(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._2 == 0L).sortBy(r => (r._3, r._4)).map(_._1).toSeq
    assert(again === orders.head)
  }
}
