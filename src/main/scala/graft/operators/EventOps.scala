package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** Event-stream analytics over the `events` table (batch form; the same
  * aggregations run under Structured Streaming in graft.streaming).
  *
  * Timestamp discipline: every operator in this file computes on `ts` as
  * int64 *nanoseconds since epoch* — full precision, and exact arithmetic
  * parity with the DuckDB oracle's `epoch_us(ts)`. That canonical type is
  * GUARANTEED by `Tables.events` regardless of the physical parquet layout:
  * TIMESTAMP(NANOS) data arrives as long ns via the sessions'
  * `spark.sql.legacy.parquet.nanosAsLong=true` and passes through;
  * timestamp[us] data (the post-round-5 generator) is converted by
  * `unix_micros(cast(ts as timestamp)) * 1000` under the repo-wide UTC
  * session (see Tables.scala's canonical-schema note). All outputs carry
  * integer epoch values, never engine-dependent timestamp types.
  *
  * Rounding policy (one rule, applied per derivation step): every integer
  * time derivation uses the SAME rounding mode on both engines. Where the
  * oracle floors (`date_trunc`/`epoch`), the Spark side uses the pmod floor
  * form `(x - pmod(x, n)) div n`; where the oracle truncates toward zero
  * (`//`, `epoch_us` scaling), the Spark side uses bare `div` — Spark `div`
  * and DuckDB `//` both truncate toward zero (verified: -7//2 = -3 in
  * both), so trunc↔trunc pairs agree at ALL epochs, not just post-1970.
  * With matched modes per step, no positive-epoch assumption is needed
  * anywhere in this file.
  */
object EventOps {

  private val NsPerHour = 3600L * 1000000000L

  /** ts (int64 ns) → hour-bucket epoch seconds; integer arithmetic only
    * (double division would lose precision above 2^53 ns). FLOOR division
    * — `ts - pmod(ts, h)` is the largest hour multiple ≤ ts — because the
    * oracle's `epoch(date_trunc('hour', ts))` floors too; a bare `div`
    * truncates toward zero and would bucket pre-1970 timestamps one hour
    * late. */
  private[graft] val hourEpochExpr =
    s"((ts - pmod(ts, $NsPerHour)) div $NsPerHour) * 3600"
  private def hourEpoch = expr(hourEpochExpr).as("hour_epoch")

  /** DuckDB twin of [[hourEpochExpr]] (floor semantics on both sides). */
  private val hourEpochSqlExpr = "CAST(epoch(date_trunc('hour', ts)) AS BIGINT)"

  /** Tumbling 1-hour windows per event type: count + exact value sum.
    * Single shuffle with map-side partial agg; output cardinality is
    * #hours × #types — tiny even at 100 TB of events. */
  def hourly(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(hourEpoch, col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 24, 6).as("sum_value"))

  val hourlySql: String =
    s"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
       | count(*) AS n_events, ${sqlSum("value", 24, 6)} AS sum_value
       |FROM events GROUP BY 1, 2""".stripMargin

  /** EWMA horizon in hours: the window carries 21 terms (k = 0..20); the
    * k=20 tail weight is 2^0, below 1 ppm of the total, so truncating
    * there loses nothing an integer fixed point can see. */
  val EwmaHorizon = 20

  /** SMOOTHED-BASELINE MONITOR — per (event_type, hour) the
    * exponentially-weighted moving average of hourly event counts with
    * α = 1/2, in EXACT integer arithmetic: α = 1/2 makes every EWMA
    * weight a power of two (2^(20−k) for lag k), so the weighted sums are
    * order-free int64 — a float EWMA recurrence would be partition-order-
    * dependent and never hash-match. This is the ops-telemetry shape
    * behind alerting ("is this hour's volume off its smoothed baseline?")
    * — the trailing-mean complement of [[anomalyHours]]' z-score, with
    * geometric decay instead of a flat 24 h window. Missing hours inside
    * a type's [min, max] span count as genuine zero observations (the
    * [[gapFill]] densification rule), so a traffic gap pulls the baseline
    * down instead of vanishing. `ewma_milli` = baseline ×1000;
    * `ratio_permille` = actual/baseline ×1000.
    *
    * Shape: one corpus scan → the |types|×|hours| hourly aggregation;
    * everything after runs on that METADATA-sized frame (dense domain
    * generated per type between its broadcast bounds, ×21 offset explode,
    * one (type, hour) aggregation) — at 100 TB the EWMA costs the same
    * hourly rollup [[hourly]] already pays, plus noise.
    *
    * Overflow (round 10, closing the last oracle-blind wrap): the weighted
    * sum `s ≤ hourly_count · (2^21 − 1)` and the `s·1000` / `x·1000000`
    * fixed points ran in int64, wrapping silently past ~4.4×10^9 events per
    * (type, hour) — identically in Spark (non-ANSI) and the old oracle, so
    * the hash check could never see it. All wide intermediates now run in
    * DECIMAL(38,0) (DuckDB twin: HUGEINT), the [[graft.operators.Ranking]]
    * cos2_fp precedent: exact for hourly counts up to ~9.2×10^15, where the
    * OUTPUT columns' own int64 fixed points saturate — no intermediate can
    * wrap before the result itself is unrepresentable. `div` on decimals is
    * Spark's IntegralDivide (exact floor, returns BIGINT), so values in the
    * old in-bound regime are bit-identical. */
  def ewma(spark: SparkSession, sfDir: String): DataFrame =
    ewmaOfCounts(Tables.events(spark, sfDir)
      .groupBy(hourEpoch, col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("h", expr("hour_epoch div 3600"))
      .select(col("event_type"), col("h"), col("n")))

  /** Core of [[ewma]] over any (event_type, h, n) hourly-count frame. */
  private[graft] def ewmaOfCounts(counts: DataFrame): DataFrame = {
    val bounds = counts.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val dense = bounds
      .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("h"))
      .join(counts, Seq("event_type", "h"), "left")
      .withColumn("x", coalesce(col("n"), lit(0L)))
      .select(col("event_type"), col("h"), col("x"))
    val contrib = dense
      .select(col("event_type"), col("h"), col("x"),
        explode(expr(s"sequence(0, $EwmaHorizon)")).as("k"))
      .select(col("event_type"), (col("h") + col("k")).as("t"),
        // xw widened BEFORE the multiply: x · 2^20 wraps int64 past x ≈ 8.8e12
        expr(s"CAST(x AS DECIMAL(38,0)) * shiftleft(CAST(1 AS BIGINT), CAST($EwmaHorizon - k AS INT))").as("xw"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST($EwmaHorizon - k AS INT))").as("w"))
    contrib.groupBy(col("event_type"), col("t"))
      .agg(sum(col("xw")).as("s"), sum(col("w")).as("wsum"))
      .join(dense.select(col("event_type"), col("h").as("t"), col("x")), Seq("event_type", "t"))
      .select(col("event_type"), (col("t") * 3600).as("hour_epoch"),
        col("x").as("n_events"),
        expr("s * 1000 div wsum").as("ewma_milli"),
        expr("CAST(x AS DECIMAL(38,0)) * 1000000 div greatest(s * 1000 div wsum, 1)").as("ratio_permille"))
  }

  /** DuckDB twin — same densification, same power-of-two weights, same
    * truncating divisions; wide intermediates in HUGEINT (the
    * DECIMAL(38,0) mirror — DuckDB would RAISE where non-ANSI Spark
    * wrapped, the divergent failure mode the widening removes). */
  val ewmaSql: String =
    s"""WITH c AS (SELECT event_type,
       |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h, count(*) AS n
       |  FROM events GROUP BY 1, 2),
       |b AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM c GROUP BY 1),
       |dense0 AS (SELECT b.event_type, g.h
       |  FROM b, LATERAL (SELECT unnest(generate_series(b.h0, b.h1)) AS h) g),
       |dense AS (SELECT d.event_type, d.h, CAST(coalesce(c.n, 0) AS BIGINT) AS x
       |  FROM dense0 d LEFT JOIN c ON c.event_type = d.event_type AND c.h = d.h),
       |contrib AS (SELECT event_type, h + k AS t,
       |    CAST(x AS HUGEINT) * (CAST(1 AS BIGINT) << ($EwmaHorizon - k)) AS xw,
       |    CAST(1 AS BIGINT) << ($EwmaHorizon - k) AS w
       |  FROM dense, LATERAL (SELECT unnest(generate_series(0, $EwmaHorizon)) AS k) u),
       |agg AS (SELECT event_type, t, sum(xw) AS s,
       |    CAST(sum(w) AS BIGINT) AS wsum
       |  FROM contrib GROUP BY 1, 2)
       |SELECT a.event_type, t * 3600 AS hour_epoch, d.x AS n_events,
       |  CAST(s * 1000 // wsum AS BIGINT) AS ewma_milli,
       |  CAST(CAST(d.x AS HUGEINT) * 1000000 // greatest(s * 1000 // wsum, 1) AS BIGINT) AS ratio_permille
       |FROM agg a JOIN dense d ON d.event_type = a.event_type AND d.h = a.t""".stripMargin

  /** Sliding windows (width 1 h, slide 15 min): each event lands in
    * exactly width/slide = 4 windows, generated by integer bucket
    * arithmetic — the same shape Spark's `window()` produces, but kept in
    * epoch integers so the oracle is bit-identical (no timestamp types
    * cross the engine boundary). Map-side explode ×4 then one shuffle.
    * Rounding per step mirrors the oracle exactly: `sec` floors (pmod
    * form, matching date_trunc('second')), the 900 s bucket truncates
    * (bare `div`, matching the oracle's `sec // 900`) — same mode each
    * step, so the pair agrees at all epochs. */
  def slidingCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val slide = 900L
    val steps = 4 // width 3600 / slide 900
    Tables.events(spark, sfDir)
      .withColumn("sec", expr("(ts - pmod(ts, 1000000000)) div 1000000000"))
      .withColumn("k", explode(expr(s"sequence(0, ${steps - 1})")))
      .withColumn("window_start",
        (expr("sec div 900") - col("k")) * slide)
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 24, 6).as("sum_value"))
  }

  val slidingCountsSql: String =
    s"""WITH e AS (
       |  SELECT event_type, value, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
       |  FROM events),
       |x AS (
       |  SELECT event_type, value, (sec // 900 - k) * 900 AS window_start
       |  FROM e, LATERAL (SELECT unnest(generate_series(0, 3)) AS k) g)
       |SELECT window_start, event_type, count(*) AS n_events,
       |  ${sqlSum("value", 24, 6)} AS sum_value
       |FROM x GROUP BY 1, 2""".stripMargin

  /** Per-event trailing-hour stats via a RANGE window frame: for every
    * event, the count and exact sum of the same user's events in
    * [ts − 1 h, ts]. RANGE (value-based) frames differ from ROWS frames
    * on ties — all rows at the boundary µs enter the frame — so the result
    * is ordering-independent and identical across engines by construction.
    * One user_id shuffle + one within-partition sort; the frame scan is
    * the running two-pointer pass window engines implement natively. The
    * sum routes through the fixed-scale DECIMAL (exact, order-free). */
  def rolling1h(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us").asc)
      .rangeBetween(-3600000000L, Window.currentRow)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("us"), col("value"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h",
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(24, 6)))
          .over(w).cast("double"))
      .select(col("event_id"), col("user_id"), col("n_1h"), col("sum_1h"))
  }

  val rolling1hSql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events)
      |SELECT event_id, user_id,
      |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
      |  CAST(sum(CAST(value AS DECIMAL(24,6))) OVER w AS DOUBLE) AS sum_1h
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY us
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin

  /** First 3 events per user (window function coverage: row_number with a
    * deterministic (ts_ns, event_id) ordering). One user_id shuffle. */
  def firstEventsPerUser(spark: SparkSession, sfDir: String): DataFrame = {
    // DuckDB 1.0 truncates TIMESTAMP_NS to µs on read, so cross-engine
    // orderings/gaps are computed at µs in BOTH engines (ts div 1000).
    val w = Window.partitionBy(col("user_id")).orderBy(expr("ts div 1000").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("user_id"), col("event_id"), col("rn").cast("long").as("rn"), col("event_type"))
  }

  val firstEventsPerUserSql: String =
    """SELECT user_id, event_id, rn, event_type FROM (
      |  SELECT user_id, event_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events) WHERE rn <= 3""".stripMargin

  /** Per-event gap-session labeling — the ONE definition of the session
    * rule (30-min inactivity, (µs, event_id) ordering) shared by
    * [[sessionize]], [[sessionConcurrency]], and the specs' naive twins:
    * lag → new-session flag → running sum, two window passes over a single
    * user_id shuffle. */
  private[operators] def sessionLabeled(spark: SparkSession, sfDir: String,
      gapMinutes: Int): DataFrame = {
    val order = Window.partitionBy(col("user_id")).orderBy(col("us").asc, col("event_id").asc)
    val gapUs = gapMinutes * 60L * 1000000L
    Tables.events(spark, sfDir)
      .withColumn("us", expr("ts div 1000")) // µs, matching DuckDB's ns→µs read
      .withColumn("prev_us", lag(col("us"), 1).over(order))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Gap-based sessionization (30-min inactivity) over the shared
    * [[sessionLabeled]] base. This is the batch twin of streaming session
    * windows; at scale the user_id shuffle is the only exchange and AQE
    * handles hot users. */
  def sessionize(spark: SparkSession, sfDir: String, gapMinutes: Int = 30): DataFrame =
    sessionLabeled(spark, sfDir, gapMinutes)
      .groupBy(col("user_id"), col("session_id").cast("long").as("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event_id"),
        max(col("event_id")).as("last_event_id"),
        dsum(col("value"), 24, 6).as("sum_value"))

  /** COHORT RETENTION: users grouped by first-event week (their cohort),
    * counted as active in each later week as an offset from the cohort —
    * the triangle matrix every growth dashboard draws. Three key-bounded
    * aggregations: first-event per user (min over one user shuffle),
    * distinct (user, week) activity, then the (cohort, offset) rollup —
    * shuffle volume never exceeds |users| + |user-weeks|, regardless of
    * event volume. Week numbering is pure integer µs division. */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"(ts div 1000) div $weekUs").as("week"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    ev.distinct()
      .join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  val cohortRetentionSql: String = {
    val weekUs = 7L * 86400L * 1000000L
    s"""WITH ev AS (SELECT DISTINCT user_id, epoch_us(ts) // $weekUs AS week FROM events),
       |cohort AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1)
       |SELECT cohort_week, week - cohort_week AS week_offset,
       |  count(*) AS n_users
       |FROM ev JOIN cohort USING (user_id)
       |GROUP BY 1, 2""".stripMargin
  }

  /** ANOMALY DETECTION over the event stream: each (event_type, hour)
    * bucket scored as a z-value against that type's TRAILING 24-hour
    * baseline (RANGE frame ending 1 hour before — the current bucket never
    * contaminates its own baseline). The score stays deterministic
    * cross-engine by staying integer until the last two ops:
    * z = (n·k − s) / sqrt(k·ss − s²) algebraically equals (n−μ)/σ but
    * needs ONE IEEE sqrt and ONE divide of exactly-agreed int64 inputs —
    * no float accumulation anywhere. Buckets with under 12 baseline hours
    * or zero variance are withheld (cold start / constant-rate).
    *
    * Scale: one (type, hour) pre-aggregation (shuffle bounded by bucket
    * count), one type-partitioned RANGE window — the monitoring query a
    * 100 TB event pipeline runs continuously. */
  def anomalyHours(spark: SparkSession, sfDir: String): DataFrame = {
    // 3 consumers (bounds, type list, dense join) read the hourly counts
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("(ts div 1000) div 3600000000").as("hour_num"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    // DENSIFY to the full (type × calendar-hour) grid: an hour with zero
    // events must contribute a 0 to the baseline AND get its own score —
    // otherwise quiet hours inflate the mean and a drop-to-zero outage
    // (the anomaly that matters most) never even produces a row. The grid
    // is |types| × |hours| — taxonomy × calendar, tiny at any corpus size.
    val bounds = hourly.agg(min(col("hour_num")).as("h0"), max(col("hour_num")).as("h1"))
    val dense = hourly.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("hour_num"))
      .join(hourly, Seq("event_type", "hour_num"), "left")
      .select(col("event_type"), col("hour_num"), coalesce(col("n"), lit(0L)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_num"))
      .rangeBetween(-24, -1)
    dense
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("s", sum(col("n")).over(w))
      .withColumn("ss", sum(col("n") * col("n")).over(w))
      .filter(col("k") >= 12 && (col("k") * col("ss") - col("s") * col("s")) > 0)
      .select(col("event_type"), col("hour_num"), col("n"),
        round((col("n") * col("k") - col("s")).cast("double") /
          sqrt((col("k") * col("ss") - col("s") * col("s")).cast("double")), 6).as("z"))
  }

  val anomalyHoursSql: String =
    """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour_num,
      |    count(*) AS n FROM events GROUP BY 1, 2),
      |b AS (SELECT min(hour_num) AS h0, max(hour_num) AS h1 FROM h),
      |grid AS (SELECT t.event_type, g.hn AS hour_num
      |  FROM (SELECT DISTINCT event_type FROM h) t, b,
      |       LATERAL (SELECT unnest(generate_series(b.h0, b.h1)) AS hn) g),
      |d AS (SELECT grid.event_type, grid.hour_num, coalesce(h.n, 0) AS n
      |  FROM grid LEFT JOIN h ON grid.event_type = h.event_type
      |                       AND grid.hour_num = h.hour_num),
      |t2 AS (SELECT *, count(*) OVER w AS k, sum(n) OVER w AS s, sum(n * n) OVER w AS ss
      |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY hour_num
      |                      RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, hour_num, CAST(n AS BIGINT) AS n,
      |  round(CAST(n * k - s AS DOUBLE) / sqrt(CAST(k * ss - s * s AS DOUBLE)), 6) AS z
      |FROM t2 WHERE k >= 12 AND (k * ss - s * s) > 0""".stripMargin

  /** MULTISET difference (EXCEPT ALL — bag semantics, where
    * [[clickNoPurchase]] is the DISTINCT form): per-user click hours minus
    * purchase hours WITH multiplicity, so a user with 3 clicks and 1
    * purchase in an hour keeps 2 rows — the reconciliation semantics
    * (inventory, billing, event-debt) that set-EXCEPT silently destroys.
    * Spark rewrites exceptAll to a replicated count aggregation: the
    * shuffle is bounded by distinct (user, hour) keys, never raw events. */
  def clickMinusPurchaseAll(spark: SparkSession, sfDir: String): DataFrame = {
    def slots(tpe: String) = Tables.events(spark, sfDir)
      .filter(col("event_type") === tpe)
      .select(col("user_id"), expr(hourEpochExpr).as("hour_epoch"))
    slots("click").exceptAll(slots("purchase"))
  }

  val clickMinusPurchaseAllSql: String =
    s"""SELECT user_id, ${hourEpochSqlExpr} AS hour_epoch FROM events WHERE event_type = 'click'
       |EXCEPT ALL
       |SELECT user_id, ${hourEpochSqlExpr} AS hour_epoch FROM events WHERE event_type = 'purchase'""".stripMargin

  /** Per-user ordered event-type PATH (session path mining): the first 50
    * steps in strict (µs, event_id) order joined with `>`. The step cap is
    * applied BEFORE aggregation via a rank that compiles to
    * WindowGroupLimit — each map task forwards at most 50 events per user,
    * so per-group state is bounded at 100 TB no matter how hot a user is
    * (the unbounded collect_list is exactly the OOM this avoids). */
  def userPaths(spark: SparkSession, sfDir: String, maxSteps: Int = 50): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .withColumn("us", expr("ts div 1000"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxSteps)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_steps"),
        concat_ws(">", transform(
          array_sort(collect_list(struct(col("us"), col("event_id"), col("event_type")))),
          x => x.getField("event_type"))).as("path"))
  }

  def userPathsSql(maxSteps: Int = 50): String =
    s"""WITH r AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
       |  FROM events)
       |SELECT user_id, count(*) AS n_steps,
       |  string_agg(event_type, '>' ORDER BY us, event_id) AS path
       |FROM r WHERE rn <= $maxSteps GROUP BY user_id""".stripMargin

  /** Calendar-hierarchy ROLLUP: event counts and exact sums at (day, hour),
    * per-day subtotal, and grand-total levels in ONE pass — Spark expands
    * the grouping sets BEFORE the exchange, so the shuffle carries ≤ 3×
    * the distinct (day, hour) count of pre-aggregated rows, never raw
    * events. The time keys are pure integer µs division — trunc on both
    * engines (`div` ↔ `//`), per the file-header rounding policy. */
  def timeRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("us", expr("ts div 1000"))
      .withColumn("day", expr("us div 86400000000"))
      .withColumn("hour", expr("us div 3600000000"))
      .rollup(col("day"), col("hour"))
      .agg(count(lit(1)).as("n_events"), graft.operators.Exact.dsum(col("value"), 24, 6).as("sum_value"))

  val timeRollupSql: String =
    s"""WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
       |    epoch_us(ts) // 3600000000 AS hour, value FROM events)
       |SELECT day, hour, count(*) AS n_events,
       |  ${graft.operators.Exact.sqlSum("value", 24, 6)} AS sum_value
       |FROM e GROUP BY ROLLUP (day, hour)""".stripMargin

  /** Interval-overlap (range) join, bin-bucketed: for every `error` event,
    * how many sessions (any user, 30-min-gap sessions) were open at that
    * instant — the "what else was the system doing" concurrency probe.
    *
    * Spark has no inequality sort-merge join: a raw
    * `ON us BETWEEN start_us AND end_us` plans as a nested-loop — O(n·m)
    * compares, the range-join scale-killer. The standard fix (DBR range
    * join / interval-tree literature) is bin bucketing: sessions explode
    * to their covered `binMinutes` buckets, probes bucket once, and the
    * range predicate verifies INSIDE equi-join matches. The shuffle is
    * bounded by |sessions| × (duration / bin + 1) + |probes| — linear with
    * a small constant, and each probe meets only its bin's sessions, never
    * the corpus. A probe's single bin occurs once per covered session, so
    * matches need no dedup. Session derivation shares [[sessionize]]'s
    * single user_id sort; the bin join is the only other exchange. */
  def sessionConcurrency(spark: SparkSession, sfDir: String,
      gapMinutes: Int = 30, binMinutes: Int = 15): DataFrame = {
    val binUs = binMinutes * 60L * 1000000L
    val sessions = sessionLabeled(spark, sfDir, gapMinutes)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"))
    val sessionBins = sessions
      .select(col("start_us"), col("end_us"),
        explode(expr(s"sequence(start_us div $binUs, end_us div $binUs)")).as("bin"))
    val probes = Tables.events(spark, sfDir)
      .filter(col("event_type") === "error")
      .select(col("event_id"), expr("ts div 1000").as("us"))
      .withColumn("bin", expr(s"us div $binUs"))
    probes.join(sessionBins, "bin")
      .filter(col("us") >= col("start_us") && col("us") <= col("end_us"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_open_sessions"))
  }

  def sessionConcurrencySql(gapMinutes: Int = 30): String = {
    val gapUs = gapMinutes * 60L * 1000000L
    s"""WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
       |s0 AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > $gapUs
       |    THEN 1 ELSE 0 END AS new_session
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |s1 AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM s0),
       |sessions AS (SELECT user_id, session_id, min(us) AS start_us, max(us) AS end_us
       |  FROM s1 GROUP BY 1, 2)
       |SELECT e.event_id, count(*) AS n_open_sessions
       |FROM ev e JOIN sessions s ON e.us BETWEEN s.start_us AND s.end_us
       |WHERE e.event_type = 'error'
       |GROUP BY 1""".stripMargin
  }

  /** As-of join: for every purchase event, the same user's most recent
    * click at-or-before it (clicks sort before purchases at equal µs;
    * ties among simultaneous clicks resolve to the highest event_id).
    *
    * Composed Spark-first as union + ignore-nulls running `last` over one
    * user_id-partitioned ordering — a single shuffle and a single sort,
    * which is exactly what a dedicated as-of physical operator would do;
    * no custom SparkPlan needed (preference (a) of the operator ladder).
    * At 100 TB this keeps as-of joins at sort-merge cost with no
    * range-explosion. */
  def asofClickBeforePurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("us", expr("ts div 1000"))
      .withColumn("kind", when(col("event_type") === "click", 0).otherwise(1))
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("kind").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("last_click_id", last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(order))
      .withColumn("last_click_us", last(when(col("kind") === 0, col("us")), ignoreNulls = true).over(order))
      .filter(col("kind") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("last_click_id"), (col("us") - col("last_click_us")).as("gap_us"))
  }

  val asofClickBeforePurchaseSql: String =
    """WITH u AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |w AS (
      |  SELECT *,
      |    last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY us, kind, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id,
      |    last_value(CASE WHEN kind = 0 THEN us END IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY us, kind, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
      |  FROM u)
      |SELECT event_id AS purchase_id, user_id, last_click_id,
      |  (us - last_click_us) AS gap_us
      |FROM w WHERE kind = 1""".stripMargin

  /** Set-operation coverage: (user, hour) slots with a click but no
    * purchase (EXCEPT ≡ left-anti on distinct keys; Spark plans it as an
    * anti join, shuffle bounded by distinct keys). */
  def clickNoPurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    def slots(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id"), hourEpoch).distinct()
    slots("click").except(slots("purchase"))
  }

  val clickNoPurchaseSql: String =
    """SELECT DISTINCT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch
      |FROM events WHERE event_type = 'click'
      |EXCEPT
      |SELECT DISTINCT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch
      |FROM events WHERE event_type = 'purchase'""".stripMargin

  /** INTERSECT coverage — the set-op twin of [[clickNoPurchase]]: (user,
    * hour) slots where a user both clicked AND purchased. Spark plans
    * `intersect` as a left-semi hash aggregate join — same shuffle shape
    * as the EXCEPT path, no subquery materialization. */
  def clickAndPurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    def slots(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id"), hourEpoch).distinct()
    slots("click").intersect(slots("purchase"))
  }

  val clickAndPurchaseSql: String =
    """SELECT DISTINCT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch
      |FROM events WHERE event_type = 'click'
      |INTERSECT
      |SELECT DISTINCT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch
      |FROM events WHERE event_type = 'purchase'""".stripMargin

  /** Per-user spend-quartile assignment via ntile(4): every event labeled
    * with which quarter of its user's value distribution it falls in —
    * the windowed bucketing shape behind per-entity feature binning.
    * ntile's bucket boundaries depend only on the partition's total order
    * (value, then event_id to break double ties), so Spark and DuckDB
    * agree row-for-row — with NULL placement pinned explicitly (NULLS
    * FIRST), because the engines' ASC defaults disagree (Spark: nulls
    * first; DuckDB: nulls last) and a nullable value column would
    * otherwise shift every bucket boundary silently. One user_id
    * shuffle+sort, nothing else. */
  def valueNtile(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("value").asc_nulls_first, col("event_id").asc)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"),
        ntile(4).over(w).cast("long").as("quartile"))
  }

  val valueNtileSql: String =
    """SELECT event_id, user_id, value,
      |  ntile(4) OVER (PARTITION BY user_id
      |    ORDER BY value ASC NULLS FIRST, event_id ASC) AS quartile
      |FROM events""".stripMargin

  /** PIVOT coverage: per-user event-type count matrix. The type list is
    * FIXED (schema-stable output, no value-discovery pre-pass — at 100 TB
    * an unpinned pivot runs an extra distinct-scan job just to learn its
    * own columns). Compiles to a single-shuffle conditional aggregation. */
  val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  def typePivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)

  val typePivotSql: String = {
    val cols = EventTypes.map(t =>
      s"count(*) FILTER (WHERE event_type = '$t') AS $t").mkString(",\n  ")
    s"""SELECT user_id,
       |  $cols
       |FROM events GROUP BY user_id""".stripMargin
  }

  /** Multi-step funnel with strict event-time ordering: first signup, then
    * the first click AFTER it, then the first purchase after THAT — per
    * user, with µs epochs (integer, engine-portable) and a steps_completed
    * rollup. Each step is one filtered aggregate joined forward, so the
    * whole funnel is a chain of user_id-partitioned hash joins/aggs — the
    * standard conversion-analysis shape, no window over the full event
    * stream. */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("us"))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("signup_us"))
    val click = ev.filter(col("event_type") === "click")
      .join(signup, Seq("user_id"))
      .filter(col("us") > col("signup_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("click_us"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .join(click, Seq("user_id"))
      .filter(col("us") > col("click_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("purchase_us"))
    signup.join(click, Seq("user_id"), "left")
      .join(purchase, Seq("user_id"), "left")
      .select(col("user_id"), col("signup_us"), col("click_us"), col("purchase_us"),
        (lit(1L) + when(col("click_us").isNotNull, 1L).otherwise(0L)
          + when(col("purchase_us").isNotNull, 1L).otherwise(0L)).as("steps_completed"))
  }

  val funnelSql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |s AS (SELECT user_id, min(us) AS signup_us FROM ev
      |      WHERE event_type = 'signup' GROUP BY user_id),
      |c AS (SELECT ev.user_id, min(us) AS click_us FROM ev
      |      JOIN s ON ev.user_id = s.user_id
      |      WHERE event_type = 'click' AND us > signup_us GROUP BY ev.user_id),
      |p AS (SELECT ev.user_id, min(us) AS purchase_us FROM ev
      |      JOIN c ON ev.user_id = c.user_id
      |      WHERE event_type = 'purchase' AND us > click_us GROUP BY ev.user_id)
      |SELECT s.user_id, signup_us, click_us, purchase_us,
      |  CAST(1 + (CASE WHEN click_us IS NOT NULL THEN 1 ELSE 0 END)
      |         + (CASE WHEN purchase_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS steps_completed
      |FROM s LEFT JOIN c ON s.user_id = c.user_id
      |       LEFT JOIN p ON s.user_id = p.user_id""".stripMargin

  /** JSON function coverage on real data: `props` holds JSON objects;
    * extract the numeric field path-wise and aggregate it per event type.
    * `get_json_object` is codegen'd and the extraction runs inside the scan
    * stage — at 100 TB semi-structured payload columns are the norm and
    * this is the cheap path (full `from_json` schema parsing only when the
    * whole object is needed). Integer outputs keep cross-engine parity
    * exact. */
  def propsJson(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  val propsJsonSql: String =
    """SELECT event_type,
      |  count(k) AS n_with_k, CAST(sum(k) AS BIGINT) AS sum_k,
      |  min(k) AS min_k, max(k) AS max_k
      |FROM (SELECT event_type, CAST(props ->> '$.k' AS BIGINT) AS k FROM events)
      |GROUP BY event_type""".stripMargin

  /** Date-part function coverage: event counts by (year, month, day-of-week).
    * Engine conventions differ — Spark `dayofweek` is 1-based from Sunday,
    * DuckDB `dow` 0-based from Sunday — so the operator pins the PORTABLE
    * encoding (0 = Sunday) explicitly rather than leaking an engine's
    * default. */
  def dateParts(spark: SparkSession, sfDir: String): DataFrame = {
    val t = timestamp_micros(expr("ts div 1000"))
    Tables.events(spark, sfDir)
      .select(year(t).cast("long").as("y"), month(t).cast("long").as("m"),
        (dayofweek(t) - 1).cast("long").as("dow"))
      .groupBy(col("y"), col("m"), col("dow"))
      .agg(count(lit(1)).as("n_events"))
  }

  val datePartsSql: String =
    """SELECT CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m,
      |  CAST(dayofweek(ts) AS BIGINT) AS dow, count(*) AS n_events
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  /** SCD TYPE-2 HISTORY: turn a per-user change-event stream into validity
    * intervals — the slowly-changing-dimension build every warehouse load
    * runs. Two window passes over ONE user_id exchange (same partitioning →
    * Catalyst plans a single shuffle): a lag() pass drops no-change rows
    * (consecutive equal values collapse, so reloads are idempotent), then a
    * lead() pass closes each surviving version at the next version's start.
    * The open version carries a NULL valid_to and is_current = 1. State per
    * user is its version count — shuffle volume is |events| once, output is
    * |versions|; nothing driver-side, nothing quadratic, at any corpus
    * size. Timestamps are µs (ts div 1000) matching DuckDB's ns→µs read;
    * (us, event_id) is the deterministic total order. */
  def scd2History(spark: SparkSession, sfDir: String,
      eventType: String = "purchase"): DataFrame = {
    val order = Window.partitionBy(col("user_id")).orderBy(col("us").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .filter(col("event_type") === eventType)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"), col("value"))
      .withColumn("prev_value", lag(col("value"), 1).over(order))
      .filter(col("prev_value").isNull || col("value") =!= col("prev_value"))
      .withColumn("valid_to", lead(col("us"), 1).over(order))
      .select(
        col("user_id"), col("value"), col("us").as("valid_from"), col("valid_to"),
        when(col("valid_to").isNull, 1L).otherwise(0L).as("is_current"))
  }

  def scd2HistorySql(eventType: String = "purchase"): String =
    s"""WITH ordered AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us, value,
       |    lag(value) OVER w AS prev_value
       |  FROM events WHERE event_type = '$eventType'
       |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
       |versions AS (
       |  SELECT * FROM ordered WHERE prev_value IS NULL OR value <> prev_value)
       |SELECT user_id, value, us AS valid_from,
       |  lead(us) OVER w AS valid_to,
       |  CAST(CASE WHEN lead(us) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
       |FROM versions
       |WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)""".stripMargin

  def sessionizeSql(gapMinutes: Int = 30): String = {
    val gapUs = gapMinutes * 60L * 1000000L
    s"""WITH ordered AS (
       |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
       |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
       |  FROM events),
       |flagged AS (
       |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > $gapUs THEN 1 ELSE 0 END AS new_session
       |  FROM ordered),
       |sess AS (
       |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM flagged)
       |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
       |  min(event_id) AS first_event_id, max(event_id) AS last_event_id,
       |  ${sqlSum("value", 24, 6)} AS sum_value
       |FROM sess GROUP BY user_id, session_id""".stripMargin
  }

  /** TIMELINE DENSIFICATION + LOCF: the hourly per-type rollup with every
    * missing hour filled in — `n_events = 0`, `is_gap = 1` — and the exact
    * hourly value sum carried forward from the last observed hour
    * (last-observation-carried-forward, the standard feature-store /
    * monitoring-dashboard densification step; leading gaps before a type's
    * first observation read 0.0). A downstream consumer gets one row per
    * (type, hour) REGARDLESS of sparsity, which is what makes joins
    * against the timeline and window arithmetic over it total.
    *
    * Shape: the dense domain is generated, not scanned — |types| × |hours|
    * rows from a per-type `sequence()` explode between the global hour
    * bounds (a 1-row broadcast aggregate), so the densification costs the
    * DOMAIN size, never the corpus size. The LOCF window shares the
    * timeline's type-keyed exchange; the hourly rollup is the one
    * corpus-sized aggregation (map-side combined, as in [[hourly]]). At
    * 100 TB of events the dense timeline is still #types × #hours rows. */
  def gapFill(spark: SparkSession, sfDir: String): DataFrame = {
    // three consumers (bounds, type domain, join probe) — materialize once
    val hourlyAgg = hourly(spark, sfDir).localCheckpoint()
    val bounds = hourlyAgg.agg(min(col("hour_epoch")).as("minh"), max(col("hour_epoch")).as("maxh"))
    val timeline = hourlyAgg.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds)) // 1-row bounds aggregate rides a broadcast
      .select(col("event_type"),
        explode(sequence(col("minh"), col("maxh"), lit(3600L))).as("hour_epoch"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_epoch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    timeline.join(hourlyAgg, Seq("event_type", "hour_epoch"), "left")
      .select(col("event_type"), col("hour_epoch"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("n_events").isNull, lit(1L)).otherwise(lit(0L)).as("is_gap"),
        coalesce(last(col("sum_value"), ignoreNulls = true).over(w), lit(0.0))
          .as("sum_value_locf"))
  }

  /** Markov TRANSITION MATRIX over per-user event sequences: counts of
    * (prev_type → next_type) steps, plus each pair's share of all
    * transitions — the next-event-prediction statistic (and the sequence
    * profile `user_paths` summarizes per user, globalized). One
    * user-keyed window (lag) then one alphabet²-bounded aggregation:
    * shuffle ≤ |events| once, output ≤ |types|² at any corpus size. The
    * per-user order is the SAME deterministic (us, event_id) total order
    * every sessionize twin uses, so the lag pairs are engine-portable.
    * Share stays integer (ppm) — no float division disagreements. */
  def transitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val steps = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"),
        col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    // Share via a GLOBAL window over the aggregated frame (≤ |types|² rows
    // — the single-partition window is trivially cheap) instead of a
    // separate total aggregate: a crossJoin(total) form re-executed the
    // whole corpus-lag lineage per reference (verified in the plan — two
    // full Window+Exchange chains), doubling the dominant cost.
    steps
      .withColumn("t", sum(col("n")).over(Window.partitionBy()))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("n * 1000000 div t").as("share_ppm"))
  }

  val transitionsSql: String =
    """WITH seq AS (
      |  SELECT event_type, lead(event_type) OVER (
      |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type
      |  FROM events),
      |steps AS (
      |  SELECT event_type AS prev_type, next_type, count(*) AS n
      |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, next_type, n,
      |  CAST(n * 1000000 // (SELECT sum(n) FROM steps) AS BIGINT) AS share_ppm
      |FROM steps""".stripMargin

  /** MULTI-TOUCH LINEAR ATTRIBUTION: each purchase's value splits equally
    * across the user's clicks in the preceding hour (the marketing twin
    * of the as-of join's last-touch). Shape discipline at 100 TB: the
    * join is an EQUI-join on user_id with the hour bound as a residual
    * range predicate (never a nested loop — user_id carries the shuffle),
    * and the per-purchase click count comes from ONE purchase-keyed
    * window over the join output, which is bounded by matched
    * (purchase × in-window clicks) pairs, not the corpus. The split is a
    * single IEEE divide per output row of an integer count — portable;
    * purchases with NO click in the window are excluded by the inner
    * join (they have no touchpoint to attribute to — the as-of query
    * covers last-touch-or-null). */
  def attribution(spark: SparkSession, sfDir: String): DataFrame = {
    def side(tpe: String) = Tables.events(spark, sfDir)
      .filter(col("event_type") === tpe)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"),
        col("value"))
    val hourUs = 3600L * 1000000L
    val p = side("purchase").select(col("user_id").as("p_user"),
      col("event_id").as("purchase_id"), col("us").as("pus"), col("value"))
    val c = side("click").select(col("user_id").as("c_user"),
      col("event_id").as("click_id"), col("us").as("cus"))
    val matched = p.join(c, col("p_user") === col("c_user") &&
      col("cus") >= col("pus") - hourUs && col("cus") <= col("pus"))
    val k = Window.partitionBy(col("purchase_id"))
    matched
      .withColumn("n_touches", count(lit(1)).over(k))
      .select(col("purchase_id"), col("p_user").as("user_id"), col("click_id"),
        col("n_touches"),
        round(col("value") / col("n_touches"), 6).as("attributed"))
  }

  val attributionSql: String =
    """SELECT purchase_id, user_id, click_id, n_touches,
      |  round(value / n_touches, 6) AS attributed
      |FROM (SELECT p.purchase_id, p.user_id, c.click_id, p.value,
      |    count(*) OVER (PARTITION BY p.purchase_id) AS n_touches
      |  FROM (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pus, value
      |        FROM events WHERE event_type = 'purchase') p
      |  JOIN (SELECT event_id AS click_id, user_id, epoch_us(ts) AS cus
      |        FROM events WHERE event_type = 'click') c
      |    ON p.user_id = c.user_id
      |   AND c.cus BETWEEN p.pus - 3600000000 AND p.pus)""".stripMargin

  /** POSITION-WEIGHTED (U-shape) ATTRIBUTION — the marketing twin a real
    * events pipeline reaches for right after [[attribution]]'s linear
    * split: the FIRST and LAST touch in each purchase's preceding-hour
    * click window get 40% of the value each, the middle touches split the
    * remaining 20% evenly (1 touch → 100%, 2 touches → 50/50 — the
    * standard degenerate cases). Same scale shape as linear attribution —
    * the user_id EQUI-join carries the shuffle with the hour bound as a
    * residual range predicate — plus the new element: a per-purchase
    * `row_number` ORDER BY (click time, click_id) inside the matched set,
    * i.e. an ordered window over the SAME purchase-keyed partitioning the
    * count already uses (one exchange serves both window functions).
    * Weights are plain IEEE doubles built from the same literals in both
    * engines; the only division is 0.2/(n−2), double-by-double. */
  def attributionPosition(spark: SparkSession, sfDir: String): DataFrame = {
    def side(tpe: String) = Tables.events(spark, sfDir)
      .filter(col("event_type") === tpe)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"),
        col("value"))
    val hourUs = 3600L * 1000000L
    val p = side("purchase").select(col("user_id").as("p_user"),
      col("event_id").as("purchase_id"), col("us").as("pus"), col("value"))
    val c = side("click").select(col("user_id").as("c_user"),
      col("event_id").as("click_id"), col("us").as("cus"))
    val matched = p.join(c, col("p_user") === col("c_user") &&
      col("cus") >= col("pus") - hourUs && col("cus") <= col("pus"))
    val byPurchase = Window.partitionBy(col("purchase_id"))
    val ordered = byPurchase.orderBy(col("cus").asc, col("click_id").asc)
    matched
      .withColumn("n_touches", count(lit(1)).over(byPurchase))
      .withColumn("touch_pos", row_number().over(ordered).cast("long"))
      .withColumn("weight",
        when(col("n_touches") === 1, lit(1.0))
          .when(col("touch_pos") === 1 || col("touch_pos") === col("n_touches"),
            when(col("n_touches") === 2, lit(0.5)).otherwise(lit(0.4)))
          .otherwise(lit(0.2) / (col("n_touches") - lit(2)).cast("double")))
      .select(col("purchase_id"), col("p_user").as("user_id"), col("click_id"),
        col("n_touches"), col("touch_pos"),
        round(col("value") * col("weight"), 6).as("attributed"))
  }

  val attributionPositionSql: String =
    """SELECT purchase_id, user_id, click_id, n_touches, touch_pos,
      |  round(value * CASE
      |      WHEN n_touches = 1 THEN CAST(1.0 AS DOUBLE)
      |      WHEN touch_pos = 1 OR touch_pos = n_touches THEN
      |        CASE WHEN n_touches = 2 THEN CAST(0.5 AS DOUBLE)
      |             ELSE CAST(0.4 AS DOUBLE) END
      |      ELSE CAST(0.2 AS DOUBLE) / CAST(n_touches - 2 AS DOUBLE)
      |    END, 6) AS attributed
      |FROM (SELECT p.purchase_id, p.user_id, c.click_id, p.value,
      |    count(*) OVER (PARTITION BY p.purchase_id) AS n_touches,
      |    row_number() OVER (PARTITION BY p.purchase_id
      |      ORDER BY c.cus, c.click_id) AS touch_pos
      |  FROM (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pus, value
      |        FROM events WHERE event_type = 'purchase') p
      |  JOIN (SELECT event_id AS click_id, user_id, epoch_us(ts) AS cus
      |        FROM events WHERE event_type = 'click') c
      |    ON p.user_id = c.user_id
      |   AND c.cus BETWEEN p.pus - 3600000000 AND p.pus)""".stripMargin

  /** Oracle: same dense domain via generate_series between the hourly
    * bounds, same LOCF via IGNORE NULLS last_value — the carried values
    * are [[Exact.dsum]] decimals, so carrying them is bit-exact. */
  val gapFillSql: String =
    s"""WITH hourly AS (
       |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
       |    count(*) AS n_events, ${sqlSum("value", 24, 6)} AS sum_value
       |  FROM events GROUP BY 1, 2),
       |bounds AS (SELECT min(hour_epoch) AS minh, max(hour_epoch) AS maxh FROM hourly),
       |timeline AS (
       |  SELECT t.event_type, g.h AS hour_epoch
       |  FROM (SELECT DISTINCT event_type FROM hourly) t, bounds b,
       |    LATERAL (SELECT unnest(generate_series(b.minh, b.maxh, 3600)) AS h) g)
       |SELECT tl.event_type, tl.hour_epoch,
       |  CAST(coalesce(h.n_events, 0) AS BIGINT) AS n_events,
       |  CAST(CASE WHEN h.n_events IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap,
       |  coalesce(last_value(h.sum_value IGNORE NULLS) OVER (
       |    PARTITION BY tl.event_type ORDER BY tl.hour_epoch
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS sum_value_locf
       |FROM timeline tl LEFT JOIN hourly h
       |  ON h.event_type = tl.event_type AND h.hour_epoch = tl.hour_epoch""".stripMargin
}
