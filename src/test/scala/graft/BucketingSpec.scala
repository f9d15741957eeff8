package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Co-located fact-fact joins via bucketing — the pre-shuffle trade every
  * 100 TB pipeline makes for its hottest join key: pay one write-side
  * bucketing pass, then every orders⋈lineitem-style join runs with ZERO
  * exchanges (bucket files align partition-for-partition). Proven here on
  * the actual plan, with broadcast disabled so the assertion can't be
  * satisfied trivially, and the joined values checked against the
  * unbucketed join. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  test("bucketed orders ⋈ lineitem joins with zero exchanges and identical results") {
    import org.apache.spark.sql.functions._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS g_orders_b")
      spark.sql("DROP TABLE IF EXISTS g_lineitem_b")
      Tables.orders(spark, Sf).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("g_orders_b")
      Tables.lineitem(spark, Sf).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("g_lineitem_b")
      val joined = spark.table("g_lineitem_b")
        .join(spark.table("g_orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val exchanges = """\(\d+\) Exchange\b""".r.findAllIn(plan).size
      // The join itself must be exchange-free; the only allowed exchange
      // is the final single-column groupBy's.
      assert(exchanges <= 1, s"bucketed join must not shuffle the facts:\n$plan")
      assert(plan.contains("SortMergeJoin"), "broadcast disabled → must be a sort-merge join")
      assert(plan.contains("Bucketed: true"), s"scan must report bucketed reading:\n$plan")
      val unbucketed = Tables.lineitem(spark, Sf)
        .join(Tables.orders(spark, Sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      assert(joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
        unbucketed.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS g_orders_b")
      spark.sql("DROP TABLE IF EXISTS g_lineitem_b")
    }
  }
}
