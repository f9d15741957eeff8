package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  test("pack_sequences: offsets are exact per-source prefix sums, bins follow from offsets") {
    val rows = Sampling.packSequences(spark, Sf).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // driver-side ground truth: scanLeft over (source, doc_id)-sorted tokens
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_._2)
      val expectedOffsets = sorted.map(_._3).scanLeft(0L)(_ + _).init
      assert(sorted.map(_._4).toSeq === expectedOffsets.toSeq)
      sorted.foreach { case (_, _, _, off, bin) =>
        assert(bin === off / Sampling.PackBinTokens)
      }
      // packing order means bins never decrease within a source
      assert(sorted.map(_._5).toSeq === sorted.map(_._5).sorted.toSeq)
      assert(sorted.head._4 === 0L, "first doc of a source starts at offset 0")
    }
    assert(rows.map(_._5).max >= 1, "corpus should fill more than one bin")
  }
}
