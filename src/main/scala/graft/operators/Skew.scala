package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew tooling for 100 TB joins and aggregations.
  *
  * First line of defense is AQE (`spark.sql.adaptive.enabled` +
  * skew-join splitting), which every session here enables. This utility is
  * the manual pattern for the cases AQE can't fix — a build side too big to
  * broadcast joined on a power-law key, or a skewed aggregation key — and
  * exists so the pattern is tested once and reused, not improvised.
  */
object Skew {

  /** Salted inner equi-join: the probe (large, skewed) side gets a
    * deterministic salt in [0, n); the build side is replicated n ways;
    * the join key becomes (key, salt), splitting each hot key's rows
    * across n reducers. Result is row-identical to the plain join.
    *
    * The salt derives from hashing `saltFrom` (any column set that varies
    * within a hot key — e.g. the probe row's primary key), never from
    * rand(): retries/speculative tasks must route rows identically.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, saltFrom: Column,
      n: Int): DataFrame = {
    require(n > 0)
    val salted = probe.withColumn("__salt", pmod(xxhash64(saltFrom), lit(n.toLong)).cast("int"))
    val replicated = build.withColumn("__salt", explode(expr(s"sequence(0, ${n - 1})")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final aggregate on key. For algebraic
    * aggregates Spark's own partial aggregation already does this; the
    * explicit form is for holistic aggregates (e.g. collect_list capped
    * per salt) or to force extra fan-out on a known-hot key. */
  def saltedCount(df: DataFrame, key: String, saltFrom: Column, n: Int): DataFrame = {
    require(n > 0)
    df.withColumn("__salt", pmod(xxhash64(saltFrom), lit(n.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("cnt"))
  }

  /** Salted skew JOIN as a first-class, oracle-checked query: events (the
    * probe side — at 100 TB a power-law stream where one hot user can hold
    * a whole shuffle partition hostage) joined to customer (a build side
    * too big to broadcast at scale) through [[saltedJoin]], then reduced to
    * per-segment totals. The DuckDB twin is the PLAIN join + group-by,
    * proving the salted plan is result-identical to the unsalted join.
    *
    * Shape: the probe shuffles on (user_id, salt) — hot keys split across
    * 8 reducers — and the build side is replicated 8× (still |customer|×8
    * rows, shuffle-bounded, never a cartesian). The per-segment aggregate
    * then moves only partial rows. Doubles sum through the fixed-scale
    * decimal path ([[Exact.dsum]]) so the result is order-independent
    * under any task schedule — exactly what the salt perturbs. */
  def eventsJoinSalted(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"))
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    saltedJoin(ev, cust, "user_id", col("event_id"), 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        Exact.dsum(col("value")).as("sum_value"))
  }

  val eventsJoinSaltedSql: String =
    s"""SELECT c_mktsegment,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       |  ${Exact.sqlSum("value")} AS sum_value
       |FROM events JOIN customer ON user_id = c_custkey
       |GROUP BY c_mktsegment""".stripMargin

  /** Per-user event counts through the salted two-phase aggregation — the
    * skew pattern as a first-class, oracle-checked query (the DuckDB twin is
    * the PLAIN group-by, proving the salted plan is result-identical). The
    * event_id salt spreads any power-law user across 8 partial groups; the
    * final aggregate moves one row per (user, salt). */
  def userEventCountsSalted(spark: SparkSession, sfDir: String): DataFrame =
    saltedCount(Tables.events(spark, sfDir), "user_id", col("event_id"), 8)

  val userEventCountsSaltedSql: String =
    "SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY user_id"

  /** Key-skew diagnosis — the MEASUREMENT that decides whether
    * [[saltedJoin]]/[[saltedCount]] (or AQE skew splitting) is needed at
    * all, as a first-class oracle-checked query. For each candidate
    * shuffle key of the events stream (`user_id`, `event_type`) it
    * profiles the per-key count distribution: exact p50/p90/p99/max key
    * counts (rank method, [[TextAnalysis.lengthQuantiles]] pattern),
    * the hottest key's corpus share in ppm, and `skew_ratio_x` =
    * max_cnt / mean_cnt in integer arithmetic — the fan-out a salt would
    * need to level the hot key (the n in salt ∈ [0, n)).
    *
    * Scale shape: one count shuffle per key column; the quantile window
    * then runs over |keys| rows, not |corpus| rows. A single global window
    * partition over |keys| is deliberate and documented: key-domain
    * cardinality (users, types) is millions at 100 TB, not billions — and
    * for billion-key domains the mergeable [[TextAnalysis.histQuantiles]]
    * sketch is the drop-in replacement. Ties in the count order break on
    * the STRING form of the key so both engines rank identically for any
    * key type. */
  def skewProfile(spark: SparkSession, sfDir: String): DataFrame = {
    def profile(keyed: DataFrame, label: String): DataFrame = {
      val counts = keyed.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").asc, col("k").asc)
      val tot = counts.agg(count(lit(1)).as("nk"),
        sum(col("cnt")).as("nr"))
      counts
        .withColumn("rn", row_number().over(w).cast("long"))
        .join(broadcast(tot))
        .groupBy()
        .agg(
          max(col("nk")).as("n_keys"),
          max(col("nr")).as("n_rows"),
          max(col("cnt")).as("max_cnt"),
          max(when(col("rn") === ceil(col("nk") * 0.5).cast("long"), col("cnt"))).as("p50_cnt"),
          max(when(col("rn") === ceil(col("nk") * 0.9).cast("long"), col("cnt"))).as("p90_cnt"),
          max(when(col("rn") === ceil(col("nk") * 0.99).cast("long"), col("cnt"))).as("p99_cnt"))
        .select(lit(label).as("key_col"), col("n_keys"), col("n_rows"),
          col("max_cnt"), col("p50_cnt"), col("p90_cnt"), col("p99_cnt"),
          expr("max_cnt * 1000000L div n_rows").as("top_share_ppm"),
          expr("max_cnt * n_keys div n_rows").as("skew_ratio_x"))
    }
    val ev = Tables.events(spark, sfDir)
    profile(ev.select(col("user_id").cast("string").as("k")), "user_id")
      .unionAll(profile(ev.select(col("event_type").as("k")), "event_type"))
  }

  val skewProfileSql: String = {
    def block(keyExpr: String, label: String) =
      s"""SELECT '$label' AS key_col, max(nk) AS n_keys, max(nr) AS n_rows,
         |  max(cnt) AS max_cnt,
         |  max(CASE WHEN rn = CAST(ceil(nk * 0.5) AS BIGINT) THEN cnt END) AS p50_cnt,
         |  max(CASE WHEN rn = CAST(ceil(nk * 0.9) AS BIGINT) THEN cnt END) AS p90_cnt,
         |  max(CASE WHEN rn = CAST(ceil(nk * 0.99) AS BIGINT) THEN cnt END) AS p99_cnt,
         |  CAST(max(cnt) * 1000000 // max(nr) AS BIGINT) AS top_share_ppm,
         |  CAST(max(cnt) * max(nk) // max(nr) AS BIGINT) AS skew_ratio_x
         |FROM (
         |  SELECT cnt, row_number() OVER (ORDER BY cnt, k) AS rn,
         |    count(*) OVER () AS nk, CAST(sum(cnt) OVER () AS BIGINT) AS nr
         |  FROM (SELECT $keyExpr AS k, CAST(count(*) AS BIGINT) AS cnt
         |        FROM events GROUP BY 1) c)""".stripMargin
    block("CAST(user_id AS VARCHAR)", "user_id") + "\nUNION ALL\n" +
      block("event_type", "event_type")
  }
}
