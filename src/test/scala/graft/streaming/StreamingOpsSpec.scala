package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.EventOps

class StreamingOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  test("streaming hourly aggregation equals the batch plan's result") {
    val streamed = StreamingOps.streamingHourly(spark, Sf)
      .collect().map(_.toSeq).toSet
    val batch = EventOps.hourly(spark, Sf)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("watermarked window stream starts and produces a bounded-state plan") {
    val df = StreamingOps.watermarkedWindowCounts(spark, Sf)
    assert(df.isStreaming)
    val q = df.writeStream.outputMode("append").format("memory")
      .queryName("graft_stream_wm_test").start()
    try q.processAllAvailable() finally q.stop()
    // Append mode withholds windows the watermark hasn't passed; with a
    // single batch the watermark only advances at the END of the batch, so
    // row count is ≤ the batch window count — semantics, not a bug.
    val n = spark.table("graft_stream_wm_test").count()
    val batchWindows = EventOps.hourly(spark, Sf).count()
    assert(n <= batchWindows)
  }
}
