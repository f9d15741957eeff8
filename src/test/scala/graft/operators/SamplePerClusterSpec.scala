package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** sample_per_cluster: the kept set must be EXACTLY the top-K most
  * prototypical members of each IVF cluster (highest assignment cosine,
  * fixed-point tie-broken by vec_id), clusters smaller than K keep
  * everything, and the output is bounded by |C|·K regardless of corpus
  * size. Ground truth is recomputed on the driver from the shared
  * ivfAssigned frame — the same assignment every IVF consumer trusts. */
class SamplePerClusterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  test("kept rows are the per-cluster top-K by fixed-point assignment cosine") {
    val assigned = Similarity.ivfAssigned(spark, Sf)
      .select(col("vec_id"), col("cluster"),
        floor(col("simc") * 1000000d).cast("long").as("cos_fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val kept = Similarity.samplePerCluster(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // (cluster, rank, vec_id, cos_fp)
    val byCluster = assigned.groupBy(_._2)
    kept.groupBy(_._1).foreach { case (cl, rows) =>
      val members = byCluster(cl).sortBy(m => (-m._3, m._1))
      val expect = members.take(Similarity.CoresetK)
      assert(rows.length === math.min(Similarity.CoresetK, members.length),
        s"cluster $cl keeps min(K, |cluster|) members")
      assert(rows.sortBy(_._2).map(r => (r._3, r._4)).toSeq ===
        expect.map(m => (m._1, m._3)).toSeq,
        s"cluster $cl kept set or order diverges from the prototypicality rule")
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // every non-empty cluster is represented
    assert(kept.map(_._1).distinct.sorted.toSeq === byCluster.keys.toSeq.sorted)
    // the coreset is corpus-size-bounded: |C|·K rows at most
    assert(kept.length <= Similarity.NumCentroids * Similarity.CoresetK)
    assert(kept.length < assigned.length, "the coreset must be a real subset")
  }
}
