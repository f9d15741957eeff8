package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** Event-stream analytics over the `events` table (batch form; the same
  * aggregations run under Structured Streaming in graft.streaming).
  *
  * Timestamp discipline: the testdata `ts` column is parquet TIMESTAMP(NS),
  * which Spark 4 refuses to read as a timestamp ([PARQUET_TYPE_ILLEGAL]).
  * Sessions set `spark.sql.legacy.parquet.nanosAsLong=true`, so `ts`
  * arrives as int64 *nanoseconds since epoch* — full precision, and exact
  * arithmetic parity with the DuckDB oracle's `epoch_us(ts)`. All outputs
  * carry integer epoch values, never engine-dependent timestamp types.
  */
object EventOps {

  private val NsPerHour = 3600L * 1000000000L

  /** ts (int64 ns) → hour-bucket epoch seconds; integer division only
    * (double division would lose precision above 2^53 ns). */
  private def hourEpoch = (expr(s"ts div $NsPerHour") * 3600).as("hour_epoch")

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

  /** Gap-based sessionization (30-min inactivity): lag → new-session flag →
    * running sum = session id. Two window passes over one user_id shuffle.
    * This is the batch twin of streaming session windows; at scale the
    * user_id shuffle is the only exchange and AQE handles hot users. */
  def sessionize(spark: SparkSession, sfDir: String, gapMinutes: Int = 30): DataFrame = {
    val order = Window.partitionBy(col("user_id")).orderBy(col("us").asc, col("event_id").asc)
    val gapUs = gapMinutes * 60L * 1000000L
    Tables.events(spark, sfDir)
      .withColumn("us", expr("ts div 1000")) // µs, matching DuckDB's ns→µs read
      .withColumn("prev_us", lag(col("us"), 1).over(order))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id").cast("long").as("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event_id"),
        max(col("event_id")).as("last_event_id"),
        dsum(col("value"), 24, 6).as("sum_value"))
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
}
