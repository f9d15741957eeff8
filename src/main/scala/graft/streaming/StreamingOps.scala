package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Exact._

/** Structured Streaming surface: the same event aggregations as
  * [[graft.operators.EventOps]], run through `readStream` so the operator
  * library is streaming-native where it should be.
  *
  * The reference has no streaming surface (SURVEY.md §2.3); this exists
  * because a 100 TB training-data pipeline ingests continuously. Batch and
  * streaming share the aggregation expressions — only the source/sink
  * differ, which is exactly Spark's unified-engine design.
  */
object StreamingOps {

  private val NsPerHour = 3600L * 1000000000L

  /** Hourly per-type counts/sums computed THROUGH the streaming engine:
    * parquet file-stream source → stateful aggregation (complete mode) →
    * in-memory sink, drained synchronously. Returns the final result table;
    * values are identical to the batch `events_hourly` (same expressions,
    * same exact-decimal sums), which is what the oracle checks.
    *
    * In production the same plan runs with `writeStream.trigger(...)` on a
    * real sink; state is bounded (#hours × #types keys). */
  def streamingHourly(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = Tables.events(spark, sfDir).schema
    // File-stream sources take a directory; glob-filter to the events table.
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
    val agg = stream
      .groupBy((expr(s"ts div $NsPerHour") * 3600).as("hour_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 24, 6).as("sum_value"))
    val name = "graft_stream_hourly"
    val q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    // Materialize: the memory-sink table is session-scoped mutable state.
    val out = spark.table(name)
    out
  }

  /** Windowed streaming aggregation with a watermark (append mode): used by
    * the streaming spec to pin the watermark/window semantics; not part of
    * the oracle surface because append mode intentionally withholds
    * still-open windows. */
  def watermarkedWindowCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = Tables.events(spark, sfDir).schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
    stream
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
  }
}
