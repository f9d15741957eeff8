package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

class CmsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  private def perWord = Tables.documents(spark, Sf)
    .select(explode(TextOps.tokens(col("text"))).as("word"))
    .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  test("CMS never underestimates: estimate >= exact count for EVERY word") {
    val words = perWord.localCheckpoint()
    val sketch = TextAnalysis.cmsSketch(words).localCheckpoint()
    val probe = words
      .select(col("word"), col("cnt"),
        explode(array((0 until TextAnalysis.CmsDepth).map(lit): _*)).as("i"))
      .withColumn("b", TextAnalysis.cmsBucket(col("i"), col("word")))
    val under = probe.join(sketch, Seq("i", "b"))
      .groupBy(col("word"), col("cnt")).agg(min(col("c")).as("est"))
      .filter(col("est") < col("cnt"))
    assert(under.count() === 0)
  }

  test("sketch is mergeable: sketch(A ++ B) = sketch(A) + sketch(B) elementwise") {
    val words = perWord
    // Split the frequency mass itself: every word's count lands partly in
    // each shard (the worst merge case — both sides touch every counter).
    val a = words.select(col("word"), expr("cnt - cnt div 2").as("cnt"))
    val b = words.select(col("word"), expr("cnt div 2").as("cnt")).filter(col("cnt") > 0)
    def m(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.cmsSketch(df).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = m(words)
    val merged = (m(a).toSeq ++ m(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(merged === whole)
  }
}
