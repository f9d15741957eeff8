package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  test("saltedJoin is row-identical to the plain join (lineitem ⋈ orders)") {
    val li = Tables.lineitem(spark, Sf).select(col("l_orderkey"), col("l_linenumber"))
      .withColumnRenamed("l_orderkey", "k")
    val ord = Tables.orders(spark, Sf).select(col("o_orderkey"), col("o_orderpriority"))
      .withColumnRenamed("o_orderkey", "k")
    val plain = li.join(ord, Seq("k"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val salted = Skew.saltedJoin(li, ord, "k", col("l_linenumber"), 7)
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(salted === plain)
  }

  test("eventsJoinSalted equals the plain events ⋈ customer aggregate") {
    val ev = Tables.events(spark, Sf).select(col("user_id"), col("value"))
    val cust = Tables.customer(spark, Sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = ev.join(cust, Seq("user_id"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        Exact.dsum(col("value")).as("sum_value"))
      .collect().map(_.toSeq).toSet
    val salted = Skew.eventsJoinSalted(spark, Sf).collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
  }

  test("saltedCount equals plain groupBy count under a hot key") {
    import spark.implicits._
    // 10k rows of one hot key + a long tail.
    val rows = (1 to 10000).map(i => ("hot", i.toLong)) ++ (1 to 500).map(i => (s"k$i", i.toLong))
    val df = rows.toDF("k", "v")
    val plain = df.groupBy("k").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, "k", col("v"), 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("skewProfile: totals match the table; quantiles ordered; ratio consistent") {
    val ev = graft.Tables.events(spark, Sf)
    val prof = Skew.skewProfile(spark, Sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.keySet === Set("user_id", "event_type"))
    for ((label, keyCol) <- Seq("user_id" -> col("user_id"), "event_type" -> col("event_type"))) {
      val r = prof(label)
      assert(r.getLong(2) === ev.count(), s"$label n_rows")
      assert(r.getLong(1) === ev.select(keyCol).distinct().count(), s"$label n_keys")
      val mx = ev.groupBy(keyCol).count().agg(max(col("count"))).collect()(0).getLong(0)
      assert(r.getLong(3) === mx, s"$label max_cnt")
      assert(r.getLong(4) <= r.getLong(5) && r.getLong(5) <= r.getLong(6) &&
        r.getLong(6) <= r.getLong(3), s"$label quantile ordering")
      assert(r.getLong(8) === mx * r.getLong(1) / r.getLong(2), s"$label skew ratio")
    }
  }
}
