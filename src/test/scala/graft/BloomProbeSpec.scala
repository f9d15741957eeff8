package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime Bloom-filter join pruning — the AQE-era optimization that matters
  * most for selective fact-⋈-filtered-dim joins at 100 TB: Spark builds a
  * bloom filter from the filtered creation side and injects a
  * `might_contain` predicate into the probe side's scan stage, so most fact
  * rows die BEFORE the shuffle instead of after it. The thresholds here
  * force injection at test scale (creation side must be estimated UNDER
  * `creationSideThreshold`, probe scan OVER
  * `applicationSideScanSizeThreshold`); on a real cluster the defaults
  * (10 MB / 10 GB) trigger on exactly the selective-join shape this
  * engine's star queries have. */
class BloomProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  private def withConfs[T](confs: Seq[(String, String)])(f: => T): T = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  private def urgentJoin() = {
    val li = Tables.lineitem(spark, Sf)
    val ord = Tables.orders(spark, Sf).filter(col("o_orderpriority") === "1-URGENT")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).cast("long").as("q"), count(lit(1)).as("n"))
  }

  test("runtime bloom filter injects might_contain into the probe-side scan and preserves results") {
    val baseline = urgentJoin().collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    withConfs(Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force a shuffle join so the bloom filter is the thing doing the
      // pre-shuffle pruning (a broadcast join would prune via its own
      // hash-table lookup instead)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")) {
      val df = urgentJoin()
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("might_contain"),
        s"expected a bloom-filter might_contain predicate on the lineitem side:\n$p")
      val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === baseline, "bloom pruning must not change results")
    }
  }
}
