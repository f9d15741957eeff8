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

  /** Streaming state/offset checkpoints on fast scratch (tmpfs by default,
    * GRAFT_LOCAL_DIR overrides — see [[graft.LocalDirs]]): state-store and
    * offset-log fsyncs were the slowest part of the demo streams on this
    * host's throttled disk. Unique per run — these are throwaway demo
    * checkpoints, not recovery points. */
  private def ckptDir(name: String): String = graft.LocalDirs.streamingCkpt(name)

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
    val q = agg.writeStream.outputMode("complete").format("memory").queryName(name)
      .option("checkpointLocation", ckptDir(name)).start()
    try q.processAllAvailable() finally q.stop()
    // Materialize: the memory-sink table is session-scoped mutable state.
    val out = spark.table(name)
    out
  }

  case class Ev(user_id: Long, event_id: Long, us: Long, value: Double)
  case class SessionRow(user_id: Long, session_id: Long, n_events: Long,
      first_event_id: Long, last_event_id: Long, sum_value: Double)

  /** Gap-based sessionization through the streaming engine's custom-state
    * API (`flatMapGroupsWithState`): per-user state, sessions cut on
    * 30-minute inactivity. Emits the same rows as the batch
    * [[graft.operators.EventOps.sessionize]] (and is checked against the
    * same DuckDB oracle): session ids are 1-based per user in µs order,
    * value sums go through scale-6 BigDecimal exactly like the batch
    * DECIMAL cast.
    *
    * Demo runs one micro-batch and emits every session; production keeps
    * only the open session in state with an event-time timeout — the
    * sessionize walk itself is identical. */
  def streamingSessionize(spark: SparkSession, sfDir: String, gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val gapUs = gapMinutes * 60L * 1000000L
    val schema = Tables.events(spark, sfDir).schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .selectExpr("user_id", "event_id", "ts div 1000 AS us", "value").as[Ev]
    val sessions = stream.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Ev], SessionRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (user, evs, state) =>
        val all = (state.getOption.getOrElse(Nil) ++ evs).sortBy(e => (e.us, e.event_id))
        state.update(Nil)
        var sid = 0L
        var out = List.newBuilder[SessionRow]
        var cur = List.empty[Ev]
        def flush(): Unit = if (cur.nonEmpty) {
          val s = cur.reverse
          // Exact twin of the batch dsum: per-value DECIMAL(24,6) (HALF_UP,
          // same as Spark's double→decimal cast), exact sum, then double.
          val sum = s.map(e => BigDecimal(e.value).setScale(6, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble
          // Batch emits min/max event_id (ids need not be monotone in time).
          val ids = s.map(_.event_id)
          out += SessionRow(user, sid, s.size.toLong, ids.min, ids.max, sum)
        }
        var prevUs = Long.MinValue
        all.foreach { e =>
          if (prevUs == Long.MinValue || e.us - prevUs > gapUs) { flush(); sid += 1; cur = Nil }
          cur = e :: cur
          prevUs = e.us
        }
        flush()
        out.result().iterator
      }
    val name = "graft_stream_sessionize"
    val q = sessions.writeStream.outputMode("append").format("memory").queryName(name)
      .option("checkpointLocation", ckptDir(name)).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
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
