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
      // Floor-division hour bucket, shared with the batch twin (see
      // EventOps.hourEpochExpr for the pre-1970 parity rationale).
      .groupBy(expr(graft.operators.EventOps.hourEpochExpr).as("hour_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 24, 6).as("sum_value"))
    val name = "graft_stream_hourly"
    // Same local-mode state-partition tuning as streamingSessionize.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = agg.writeStream.outputMode("complete").format("memory").queryName(name)
        .option("checkpointLocation", ckptDir(name)).start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    // Materialize: the memory-sink table is session-scoped mutable state.
    spark.table(name)
  }

  case class Ev(user_id: Long, event_id: Long, us: Long, value: Double)
  case class SessionRow(user_id: Long, session_id: Long, n_events: Long,
      first_event_id: Long, last_event_id: Long, sum_value: Double)

  /** Open-session state — AGGREGATES ONLY, never an event buffer, so
    * per-key state is O(1) no matter how long a session runs. `sumMicros`
    * is the exact scale-6 sum as an unscaled long (the BigDecimal twin of
    * the batch DECIMAL(24,6) cast — sums of longs are exact, and
    * `BigDecimal(sumMicros, 6).toDouble` reproduces the batch double).
    *
    * `n == 0` is the TOMBSTONE form: no session is open, but `sid`
    * remembers the last emitted ordinal so a user who returns after a
    * timeout-closed session continues 1,2,3,… exactly like the batch
    * numbering. Ordinal session ids inherently need a per-user lifetime
    * counter; the tombstone is that counter (O(1), no timeout armed), not
    * a buffer. */
  case class OpenSession(sid: Long, n: Long, minId: Long, maxId: Long,
      sumMicros: Long, lastUs: Long)

  private def micros(v: Double): Long =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .underlying.unscaledValue.longValueExact

  private def emitRow(user: Long, s: OpenSession): SessionRow =
    SessionRow(user, s.sid, s.n, s.minId, s.maxId, BigDecimal(s.sumMicros, 6).toDouble)

  /** PRODUCTION-SHAPE gap sessionization over any streaming event source:
    * `flatMapGroupsWithState` with an EVENT-TIME TIMEOUT. Per user, state
    * holds only the open session's aggregates; closed sessions are emitted
    * the moment a batch observes the gap, and the final open session is
    * emitted by the state-store timeout once the watermark passes
    * `last event + gap` — no end-of-stream flush, no unbounded buffer.
    * Session ids are 1-based per user in µs order, matching the batch
    * [[graft.operators.EventOps.sessionize]] and its DuckDB oracle.
    *
    * Within a batch events are sorted here; ACROSS batches ordering is the
    * watermark's job — an event older than the open session's `lastUs`
    * that arrives in a later batch would be appended (classic
    * at-watermark-granularity semantics; the delay parameter is the
    * disorder budget, and the bench harness feeds time-split chunks so the
    * guarantee is exact). */
  def sessionizeStream(
      stream: org.apache.spark.sql.Dataset[Ev],
      gapUs: Long,
      watermarkDelay: String = "0 seconds"): org.apache.spark.sql.Dataset[SessionRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .withColumn("event_time", timestamp_micros(col("us")))
      .withWatermark("event_time", watermarkDelay)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // Watermark passed lastUs + gap: the open session is closed.
            // Leave the sid-counter tombstone (no timeout armed) so a
            // returning user continues the ordinal sequence.
            val s = state.get
            state.update(OpenSession(s.sid, 0L, 0L, 0L, 0L, s.lastUs))
            Iterator.single(emitRow(user, s))
          } else {
            val sorted = evs.toIndexedSeq.sortBy(e => (e.us, e.event_id))
            val out = List.newBuilder[SessionRow]
            var cur = state.getOption.orNull
            sorted.foreach { e =>
              val m = micros(e.value)
              cur =
                if (cur == null)
                  OpenSession(1L, 1L, e.event_id, e.event_id, m, e.us)
                else if (cur.n == 0L) // tombstone: continue the ordinals
                  OpenSession(cur.sid + 1L, 1L, e.event_id, e.event_id, m, e.us)
                else if (e.us - cur.lastUs > gapUs) {
                  out += emitRow(user, cur)
                  OpenSession(cur.sid + 1L, 1L, e.event_id, e.event_id, m, e.us)
                } else
                  OpenSession(cur.sid, cur.n + 1,
                    math.min(cur.minId, e.event_id), math.max(cur.maxId, e.event_id),
                    cur.sumMicros + m, math.max(cur.lastUs, e.us))
            }
            // The data path always sees ≥1 event, so cur is a live session.
            state.update(cur)
            // Close via timeout when the watermark passes the gap edge.
            // (max-guard: a timestamp at/behind the watermark is illegal.)
            state.setTimeoutTimestamp(math.max(
              (cur.lastUs + gapUs) / 1000L + 1L, state.getCurrentWatermarkMs + 1L))
            out.result().iterator
          }
      }
  }

  /** Gap-based sessionization through the streaming engine, fed in
    * TIME-SPLIT micro-batches plus one far-future watermark-advancing
    * sentinel so every session (including each user's last) is emitted by
    * the event-time-timeout path — the oracle then checks the production
    * operator at full strength. The driver-side collect here is the DEMO
    * SOURCE (a MemoryStream feeder standing in for Kafka), not part of the
    * operator: [[sessionizeStream]] itself never touches the driver. */
  def streamingSessionize(spark: SparkSession, sfDir: String, gapMinutes: Int = 30,
      numChunks: Int = 2): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val gapUs = gapMinutes * 60L * 1000000L
    val evs = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "ts div 1000 AS us", "value").as[Ev]
      .collect().sortBy(_.us)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Ev]
    val sessions = sessionizeStream(source.toDS(), gapUs)
    val name = "graft_stream_sessionize"
    // Local-mode harness tuning, not semantics: each micro-batch pays a
    // fixed per-state-partition cost (store open/commit/snapshot), and the
    // demo's keyspace is thousands of users, so 8 state partitions beat
    // the session default. Pinned at stream start from the session conf;
    // restored afterwards. A cluster run would size this to its executors.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = sessions.writeStream.outputMode("append").format("memory").queryName(name)
        .option("checkpointLocation", ckptDir(name)).start()
      try {
        val chunkSize = math.max(1, math.ceil(evs.length.toDouble / numChunks).toInt)
        evs.grouped(chunkSize).foreach { chunk =>
          source.addData(chunk.toSeq)
          q.processAllAvailable() // one micro-batch per time-split chunk
        }
        // Sentinel: pushes the watermark past every real session's gap
        // edge, firing the timeouts. Its own (negative-user) session stays
        // open and is filtered out below.
        source.addData(Ev(-1L, -1L, evs.last.us + 1000L * gapUs, 0.0))
        q.processAllAvailable()
      } finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    spark.table(name).filter(col("user_id") >= 0)
  }

  case class Doc(doc_id: Long, text: String)
  case class TypedEv(user_id: Long, event_id: Long, us: Long)

  /** Watermarked STREAM-STREAM interval join: clicks and purchases arrive
    * on separate streams; each purchase joins the same user's clicks from
    * the preceding hour. Inner stream-stream joins emit a pair as soon as
    * both rows have arrived; the watermarks plus the two-sided time
    * condition are what let the engine EVICT buffered rows once the other
    * side's watermark passes their join range — bounded state, the
    * production requirement for an unbounded ingest. Feeding time-split
    * chunks keeps eviction exact (a row is only evictable once every
    * possible partner is, by sort order, already ingested), so the DuckDB
    * interval-join oracle checks this path value-for-value. */
  def streamingIntervalJoin(spark: SparkSession, sfDir: String,
      numChunks: Int = 2): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def side(tpe: String) = Tables.events(spark, sfDir)
      .filter(col("event_type") === tpe)
      .selectExpr("user_id", "event_id", "ts div 1000 AS us").as[TypedEv]
      .collect().sortBy(_.us)
    val clickRows = side("click")
    val purchRows = side("purchase")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clickSrc = MemoryStream[TypedEv]
    val purchSrc = MemoryStream[TypedEv]
    val clicks = clickSrc.toDS()
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        timestamp_micros(col("us")).as("c_time"))
      .withWatermark("c_time", "0 seconds")
    val purchases = purchSrc.toDS()
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        timestamp_micros(col("us")).as("p_time"))
      .withWatermark("p_time", "0 seconds")
    val joined = purchases.join(clicks, expr(
      "p_user = c_user AND c_time >= p_time - INTERVAL 1 HOUR AND c_time <= p_time"))
      .select(col("purchase_id"), col("p_user").as("user_id"), col("click_id"))
    val name = "graft_stream_ivjoin"
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = joined.writeStream.outputMode("append").format("memory").queryName(name)
        .option("checkpointLocation", ckptDir(name)).start()
      try {
        val cSize = math.max(1, math.ceil(clickRows.length.toDouble / numChunks).toInt)
        val pSize = math.max(1, math.ceil(purchRows.length.toDouble / numChunks).toInt)
        clickRows.grouped(cSize).zipAll(purchRows.grouped(pSize), Array.empty[TypedEv], Array.empty[TypedEv])
          .foreach { case (cs, ps) =>
            if (cs.nonEmpty) clickSrc.addData(cs.toSeq)
            if (ps.nonEmpty) purchSrc.addData(ps.toSeq)
            q.processAllAvailable()
          }
      } finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    spark.table(name)
  }

  val streamingIntervalJoinSql: String =
    """SELECT p.purchase_id, p.user_id, c.click_id
      |FROM (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pus
      |      FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT event_id AS click_id, user_id, epoch_us(ts) AS cus
      |      FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND c.cus BETWEEN p.pus - 3600000000 AND p.pus""".stripMargin

  /** Streaming EXACT dedup — the continuous-ingest twin of
    * [[graft.operators.Dedup.exact]]: hash each arriving document and
    * `dropDuplicates` on the hash through the streaming engine, so state
    * is ONE small row per distinct hash (never a document buffer) and a
    * re-ingested duplicate is suppressed across micro-batches. Emits each
    * distinct content hash exactly once (append mode), which is
    * deterministic regardless of feed order — that is what lets the DuckDB
    * oracle (`SELECT DISTINCT md5(text)`) hash-check the streaming path at
    * full strength. Production note: with an event-time column the same
    * plan bounds state via `dropDuplicatesWithinWatermark`; the unbounded
    * form here matches the batch operator's semantics exactly. */
  def streamingDedup(spark: SparkSession, sfDir: String, numChunks: Int = 2): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").as[Doc].collect()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Doc]
    val deduped = source.toDS()
      .select(md5(col("text")).as("content_hash"))
      .dropDuplicates("content_hash")
    val name = "graft_stream_dedup"
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = deduped.writeStream.outputMode("append").format("memory").queryName(name)
        .option("checkpointLocation", ckptDir(name)).start()
      try {
        val chunkSize = math.max(1, math.ceil(docs.length.toDouble / numChunks).toInt)
        docs.grouped(chunkSize).foreach { chunk =>
          source.addData(chunk.toSeq)
          q.processAllAvailable()
        }
      } finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    spark.table(name)
  }

  case class UpEv(user_id: Long, event_id: Long, us: Long, value: Double)

  /** CONTINUOUS UPSERT via `foreachBatch` — the streaming twin of the batch
    * [[graft.operators.Relational.snapshotMerge]] MERGE kernel, and the
    * sink-side pattern Structured Streaming itself prescribes for
    * maintaining a keyed table: each micro-batch reduces to latest-per-key
    * (WindowGroupLimit), full-outer-merges with the current snapshot under
    * a latest-wins (us, event_id) comparison — correct under ANY batch
    * split, not just ordered feeds — and publishes a new snapshot version
    * (the overwrite-and-swap a lakehouse MERGE INTO does transactionally).
    * State lives in the TABLE, not the state store, so the stream restarts
    * for free and the snapshot is queryable mid-stream.
    *
    * Scale: every merge is |keys|-bounded (both sides pre-reduced), the
    * snapshot is partitioned storage (not driver memory), and at 100 TB
    * the same loop runs with bucket-co-located snapshot+batch on the merge
    * key. Returns the final snapshot; the oracle checks it equals the
    * batch latest-purchase-per-user over the whole table. */
  def streamingUpsert(spark: SparkSession, sfDir: String, numChunks: Int = 3): DataFrame = {
    import spark.implicits._
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .selectExpr("user_id", "event_id", "ts div 1000 AS us", "value").as[UpEv]
      .collect().sortBy(e => (e.us, e.event_id))
    streamingUpsertOf(spark, purchases.toIndexedSeq, numChunks)
  }

  /** Core of [[streamingUpsert]] over an explicit feed — split out so the
    * convergence property (ANY chunking → the batch snapshot) can run on
    * crafted/randomized event sets, including out-of-order feeds the
    * latest-wins comparison must absorb. */
  def streamingUpsertOf(spark: SparkSession, purchases: Seq[UpEv],
      numChunks: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.expressions.Window
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[UpEv]
    val baseDir = graft.LocalDirs.streamingCkpt("graft_stream_upsert_snap")
    var currentVersion = -1L
    def snapPath(v: Long) = s"$baseDir/v$v"
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = source.toDS().writeStream
        .option("checkpointLocation", ckptDir("graft_stream_upsert"))
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[UpEv], batchId: Long) =>
          val w = Window.partitionBy(col("user_id"))
            .orderBy(col("us").desc, col("event_id").desc)
          val latest = batch.toDF()
            .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
          val merged =
            if (currentVersion < 0) latest
            else {
              val snap = spark.read.parquet(snapPath(currentVersion))
              snap.as("s").join(latest.as("u"),
                  col("s.user_id") === col("u.user_id"), "full_outer")
                .select(
                  coalesce(col("u.user_id"), col("s.user_id")).as("user_id"),
                  when(col("s.user_id").isNull ||
                      (col("u.user_id").isNotNull &&
                        (col("u.us") > col("s.us") ||
                          (col("u.us") === col("s.us") && col("u.event_id") > col("s.event_id")))),
                    struct(col("u.us").as("us"), col("u.event_id").as("event_id"),
                      col("u.value").as("value")))
                    .otherwise(struct(col("s.us").as("us"), col("s.event_id").as("event_id"),
                      col("s.value").as("value"))).as("r"))
                .select(col("user_id"), col("r.us").as("us"),
                  col("r.event_id").as("event_id"), col("r.value").as("value"))
            }
          merged.write.mode("overwrite").parquet(snapPath(batchId))
          currentVersion = batchId
        }
        .start()
      try {
        val chunkSize = math.max(1, math.ceil(purchases.length.toDouble / numChunks).toInt)
        purchases.grouped(chunkSize).foreach { chunk =>
          source.addData(chunk.toSeq)
          q.processAllAvailable()
        }
      } finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    if (currentVersion < 0) // empty feed → no batch ever fired, no snapshot
      spark.range(0).selectExpr("id AS user_id", "id AS last_us",
        "CAST(id AS DOUBLE) AS last_value")
    else
      spark.read.parquet(snapPath(currentVersion))
        .select(col("user_id"), col("us").as("last_us"), col("value").as("last_value"))
  }

  val streamingUpsertSql: String =
    """SELECT user_id, us AS last_us, value AS last_value FROM (
      |  SELECT user_id, epoch_us(ts) AS us, value, row_number() OVER (
      |    PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |  FROM events WHERE event_type = 'purchase') WHERE rn = 1""".stripMargin

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
