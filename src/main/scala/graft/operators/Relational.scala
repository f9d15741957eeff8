package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** TPC-H-style relational coverage over the driver testdata (TESTDATA.md).
  *
  * The reference itself has no joins/windows (SURVEY.md §2.3); these queries
  * exist because the engine is a general analytics library, and they are the
  * bench headliners. Each is written so Catalyst gets a fully declarative
  * plan: filters reach the parquet scan (PushedFilters), projections prune
  * columns (ReadSchema), small dimension tables are broadcast, and the big
  * fact-table shuffles carry pre-aggregated (partial HashAggregate) rows.
  */
object Relational {

  /** TPC-H Q1 analog: scan-heavy single-shuffle aggregation over lineitem.
    * At 100 TB this is the canonical "scan + partial agg + tiny exchange"
    * shape — the exchange carries ≤ (#flags × #status) rows per task.
    */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice"), 24, 2).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        davg(col("l_extendedprice"), 24, 2).as("avg_price"),
        davg(col("l_discount"), 12, 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       | sum(l_quantity) AS sum_qty,
       | ${sqlSum("l_extendedprice", 24, 2)} AS sum_base_price,
       | ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       | ${sqlSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       | (sum(l_quantity) / count(*)) AS avg_qty,
       | ${sqlAvg("l_extendedprice", 24, 2)} AS avg_price,
       | ${sqlAvg("l_discount", 12, 4)} AS avg_disc,
       | count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** ROLLUP over (returnflag, linestatus): grouping-sets coverage — Spark
    * `rollup` and DuckDB `GROUP BY ROLLUP` both emit NULL for the rolled-up
    * levels, so rows align including subtotals and the grand total. */
  def q1Rollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice"), 24, 2).as("sum_base_price"),
        count(lit(1)).as("n_rows"))

  val q1RollupSql: String =
    s"""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
       | ${sqlSum("l_extendedprice", 24, 2)} AS sum_base_price, count(*) AS n_rows
       |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** CUBE over (returnflag, linestatus): the full grouping-sets lattice —
    * all four combinations including both one-dimension subtotals, where
    * [[q1Rollup]] only descends the hierarchy. Spark expands the lattice
    * BEFORE the exchange (one Expand + one partial HashAggregate), so the
    * shuffle still carries ≤ 4 × (#flags × #status) pre-aggregated rows —
    * the multi-dimensional report shape at 100 TB. */
  def q1Cube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice"), 24, 2).as("sum_base_price"),
        count(lit(1)).as("n_rows"))

  val q1CubeSql: String =
    s"""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
       | ${sqlSum("l_extendedprice", 24, 2)} AS sum_base_price, count(*) AS n_rows
       |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** Top-3 customers per nation by order count: join + window rank with the
    * rank filter compiled to WindowGroupLimit (each shuffle partition keeps
    * only its local top-3 per nation BEFORE the final sort — never a global
    * or even per-nation full sort). nation is the only broadcast (fixed 25
    * rows); orders pre-aggregates to one row per customer before any join. */
  def topCustomersPerNation(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val perCust = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_name")).orderBy(col("n_orders").desc, col("c_custkey").asc)
    Tables.customer(spark, sfDir)
      .join(perCust, col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("n_name"), col("c_custkey"), col("n_orders"), col("rank"))
  }

  def topCustomersPerNationSql(k: Int = 3): String =
    s"""SELECT n_name, c_custkey, n_orders, rank FROM (
       |  SELECT n_name, c_custkey, n_orders,
       |    row_number() OVER (PARTITION BY n_name
       |      ORDER BY n_orders DESC, c_custkey ASC) AS rank
       |  FROM customer
       |  JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1) o
       |    ON c_custkey = o_custkey
       |  JOIN nation ON c_nationkey = n_nationkey)
       |WHERE rank <= $k""".stripMargin

  /** TPC-H Q3 analog: 3-way join + agg + top-10. orders⋈lineitem shuffles
    * on the shared orderkey so the join and the groupBy reuse one
    * partitioning. Top-k runs as a partial TakeOrdered per partition — no
    * global sort of the aggregate. customer carries NO broadcast hint: it
    * grows with sf, so a forced hint would OOM at 100× where AQE picks
    * broadcast-vs-shuffle from measured sizes (at sf0.1 AQE still
    * broadcasts it — same plan, no cliff). Hints are reserved for the
    * fixed-cardinality dimensions (nation/region). */
  def q3Topk(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, sfDir).filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
    val li = Tables.lineitem(spark, sfDir).filter(col("l_shipdate") > lit("1998-07-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .select(col("l_orderkey"), unix_timestamp(col("o_orderdate")).as("o_orderdate_epoch"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  val q3TopkSql: String =
    s"""SELECT l_orderkey,
       | CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_epoch,
       | o_orderpriority,
       | ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem, orders, customer
       |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
       |  AND c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey ASC
       |LIMIT 10""".stripMargin

  /** Anti-join coverage: customers that never placed an urgent order. At
    * scale this is a shuffled left-anti hash join on custkey — no NOT IN
    * subquery materialization. */
  def customersNoOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(
        Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  val customersNoOrdersSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin

  /** TPC-H Q4-shaped EXISTS semi-join: order counts per priority among
    * orders with at least one returned line item. `left_semi` is the plan
    * shape — the fact side probes and short-circuits on first match, no
    * duplicate-producing inner join followed by a distinct. Both join
    * inputs shuffle on orderkey once; the returned-lines filter reaches
    * the lineitem scan. */
  def ordersWithReturns(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(
        Tables.lineitem(spark, sfDir).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))

  val ordersWithReturnsSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
      |GROUP BY 1""".stripMargin

  /** TPC-H Q14 analog: promotion revenue share for one ship month. The
    * part dimension grows with sf so (like customer/supplier) it carries NO
    * broadcast hint — AQE decides; the date filter reaches the lineitem
    * scan as a PushedFilter, so the join probe side is one month of the
    * fact table, not the whole thing. The conditional revenue goes through
    * the DECIMAL-exact sum and the final ratio is ONE IEEE divide of two
    * deterministic doubles — reproducible on any cluster layout. */
  def q14Promo(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-02-01").cast("timestamp"))
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .agg(
        dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))).as("promo_revenue"),
        dsum(rev).as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 6).as("promo_pct"))
  }

  val q14PromoSql: String =
    s"""SELECT promo_revenue, total_revenue,
       |  round(100.0 * promo_revenue / total_revenue, 6) AS promo_pct
       |FROM (SELECT
       |  ${sqlSum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS promo_revenue,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1998-02-01 00:00:00')""".stripMargin

  /** TPC-H Q17 analog: average yearly revenue lost by only shipping
    * small-quantity orders of one brand's small parts. The selective dim
    * predicate (one brand × small sizes — ~0.07 % of `part`) is the
    * textbook RUNTIME-FILTER shape: at cluster scale Spark injects a Bloom
    * filter built from the filtered dim keys into the lineitem scan, so
    * the fact side is pruned BEFORE the shuffle (PlanAuditSpec forces the
    * size thresholds locally and asserts the injected
    * `bloom_filter_might_contain` plus result equality). The correlated
    * per-part average decorrelates to ONE window over the already
    * dim-restricted join output — the window input is bounded by the
    * selective parts' lineitems, never the whole fact table. Quantities
    * are integral doubles (exact sums at any merge order), revenue goes
    * through the DECIMAL sum, so the single output row is bit-portable. */
  def q17SmallQty(spark: SparkSession, sfDir: String,
      brand: String = "Brand#5", maxSize: Int = 10): DataFrame = {
    val p = Tables.part(spark, sfDir)
      .filter(col("p_brand") === brand && col("p_size") <= maxSize)
      .select(col("p_partkey"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .withColumn("part_avg_qty",
        sum(col("l_quantity")).over(w) / count(lit(1)).over(w))
      .filter(col("l_quantity") < lit(0.2) * col("part_avg_qty"))
      .agg(round(dsum(col("l_extendedprice")) / lit(7.0), 6).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  /** Oracle keeps the correlated form — the decorrelation is the thing
    * under test. DuckDB's avg(double) is sum/count over integral
    * quantities, hence exact and order-independent like the window twin. */
  def q17SmallQtySql(brand: String = "Brand#5", maxSize: Int = 10): String =
    s"""SELECT round(${sqlSum("l_extendedprice")} / 7.0, 6) AS avg_yearly,
       |  count(*) AS n_small
       |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       |  AND p.p_brand = '$brand' AND p.p_size <= $maxSize
       |WHERE l.l_quantity < 0.2 * (SELECT avg(l2.l_quantity)
       |  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  /** TPC-H Q13 analog: the customer order-count DISTRIBUTION (how many
    * customers placed 0, 1, 2, … non-urgent orders). The classic form is a
    * left-outer join customer⟕orders with the filter in the join condition;
    * the scale-right decorrelation used here pre-aggregates the FACT side
    * to one (o_custkey, cnt) row per customer BEFORE the join — at 100 TB
    * the outer join then moves |customer| rows instead of |orders| rows,
    * and the zero-order customers materialize as a null-side coalesce(0),
    * not as exploded join rows. Second aggregate is on the tiny count
    * domain. The DuckDB oracle keeps the textbook outer-join form, proving
    * the pre-aggregated plan result-identical. */
  def q13OrderDist(spark: SparkSession, sfDir: String): DataFrame = {
    val perCust = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    Tables.customer(spark, sfDir).select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  val q13OrderDistSql: String =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      |  SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS c_count
      |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |    AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey) per_cust
      |GROUP BY c_count""".stripMargin

  /** TPC-H Q5 analog: 6-way star join. nation/region are fixed-cardinality
    * dimensions (25/5 rows at every sf) and keep explicit broadcast hints;
    * customer/supplier GROW with sf, so their join strategy is left to AQE
    * — at bench scale it still broadcasts them (same plan), and at 100×
    * it degrades gracefully to a shuffled hash join instead of forcing an
    * executor-OOM broadcast. */
  def q5Region(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val cust = Tables.customer(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    val nat = Tables.nation(spark, sfDir)
    val reg = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))

  }

  val q5RegionSql: String =
    s"""SELECT n_name, ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem, orders, customer, supplier, nation, region
       |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
       |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
       |GROUP BY n_name""".stripMargin

  /** TPC-H Q7 analog (volume shipping): revenue flowing between two
    * specific nations by ship year, in both directions. Two `nation`
    * broadcasts under different aliases filter BOTH endpoints early —
    * the (supplier-nation, customer-nation) pair predicate reaches the
    * joins as equi-conditions on broadcast dimensions, so the fact tables
    * shuffle only on their join keys (orderkey, custkey, suppkey) and the
    * nation filtering never forces an extra exchange. Ship-year is
    * integer µs arithmetic on the oracle side to stay type-portable. */
  def q7Volume(spark: SparkSession, sfDir: String,
      nationA: String = "NATION_3", nationB: String = "NATION_7"): DataFrame = {
    val n1 = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  def q7VolumeSql(nationA: String = "NATION_3", nationB: String = "NATION_7"): String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  count(*) AS n_lines
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE (n1.n_name = '$nationA' AND n2.n_name = '$nationB')
       |   OR (n1.n_name = '$nationB' AND n2.n_name = '$nationA')
       |GROUP BY 1, 2, 3""".stripMargin

  /** TPC-H Q8 analog (national market share): of all revenue from one
    * part type sold to customers in one region over two order years, the
    * fraction supplied by one nation, per year. The last classic TPC-H
    * shape expressible on these tables (Q2/Q9/Q11/Q20 need the absent
    * partsupp table). Plan discipline at 100 TB:
    *   - the SELECTIVE dim (p_type filter, ~1/5 of `part`) joins the fact
    *     FIRST — the q17 runtime-filter shape, so at cluster scale the
    *     lineitem scan is Bloom-pruned before its shuffle;
    *   - the o_orderdate window reaches the orders scan as PushedFilters;
    *   - region restriction pre-joins nation⋈region into ONE broadcast
    *     (25×5 rows — dimension work never touches an exchange), and the
    *     supplier nation rides a second tiny broadcast;
    *   - market share = conditional DECIMAL sum / total DECIMAL sum, one
    *     IEEE divide per year row — bit-portable like q14's ratio.
    * The share nation participates via the CASE, not a filter, so the
    * denominator keeps all nations — the part TPC-H implementations get
    * wrong first. */
  def q8MktShare(spark: SparkSession, sfDir: String, region: String = "AMERICA",
      pType: String = "PROMO", nation: String = "NATION_3"): DataFrame = {
    val p = Tables.part(spark, sfDir).filter(col("p_type") === pType)
      .select(col("p_partkey"))
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    // nation⋈region collapses to one ≤25-row broadcast keyed on nationkey.
    val custNations = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val suppNations = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, sfDir)
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNations), col("c_nationkey") === col("cn_key"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNations), col("s_nationkey") === col("sn_key"))
      .groupBy(col("o_year"))
      .agg(
        dsum(when(col("supp_nation") === nation, rev).otherwise(lit(0.0)))
          .as("nation_volume"),
        dsum(rev).as("total_volume"))
      .select(col("o_year"), col("nation_volume"), col("total_volume"),
        round(col("nation_volume") / col("total_volume"), 6).as("mkt_share"))
  }

  def q8MktShareSql(region: String = "AMERICA", pType: String = "PROMO",
      nation: String = "NATION_3"): String =
    s"""SELECT o_year, nation_volume, total_volume,
       |  round(nation_volume / total_volume, 6) AS mkt_share
       |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |  ${sqlSum(s"CASE WHEN n2.n_name = '$nation' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS nation_volume,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS total_volume
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |JOIN region ON n1.n_regionkey = r_regionkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |WHERE r_name = '$region' AND p_type = '$pType'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY 1)""".stripMargin

  /** LEFT OUTER join coverage: every customer with their count/total of
    * high-value (> 300k) orders, customers with none kept at explicit
    * zeros via COALESCE. The fact side pre-aggregates to ≤ one row per
    * customer BEFORE the join, so the outer join's null-extension work is
    * bounded by |customer| — the "preserve the dimension" report shape.
    * The price filter reaches the orders scan as a PushedFilter. */
  def customerValueProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val big = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 300000.0)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_big"), dsum(col("o_totalprice"), 24, 2).as("big_spend"))
    Tables.customer(spark, sfDir)
      .join(big, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("n_big"), lit(0L)).as("n_big"),
        coalesce(col("big_spend"), lit(0.0)).as("big_spend"))
  }

  val customerValueProfileSql: String =
    s"""SELECT c_custkey, c_name,
       |  coalesce(n_big, 0) AS n_big, coalesce(big_spend, 0.0) AS big_spend
       |FROM customer LEFT JOIN (
       |  SELECT o_custkey, count(*) AS n_big,
       |    ${sqlSum("o_totalprice", 24, 2)} AS big_spend
       |  FROM orders WHERE o_totalprice > 300000.0 GROUP BY 1) big
       |ON c_custkey = o_custkey""".stripMargin

  /** Correlated-scalar-subquery coverage: orders priced > 1.5× that
    * customer's own average ("big-ticket for this account"). The
    * correlated `(SELECT avg ... WHERE o_custkey = outer)` decorrelates to
    * ONE window aggregate over ONE custkey exchange — no self-join, no
    * second scan of the fact table. The mean is the [[Exact.davg]] form
    * (exact decimal sum / exact count, one IEEE divide) so both engines
    * agree bit-for-bit on the 1.5× threshold comparison. */
  def ordersAboveCustAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
    Tables.orders(spark, sfDir)
      .withColumn("cust_avg",
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(24, 2))).over(w)
          .cast("double") / count(lit(1)).over(w))
      .filter(col("o_totalprice") > lit(1.5) * col("cust_avg"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("cust_avg"))
  }

  val ordersAboveCustAvgSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, cust_avg FROM (
      |  SELECT o_orderkey, o_custkey, o_totalprice,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(24,2))) OVER w AS DOUBLE)
      |      / count(*) OVER w AS cust_avg
      |  FROM orders WINDOW w AS (PARTITION BY o_custkey))
      |WHERE o_totalprice > 1.5 * cust_avg""".stripMargin

  /** FULL OUTER join / MERGE-INTO (CDC upsert) coverage: a base snapshot
    * (latest purchase per user before Jan 10) merged with an update batch
    * (latest purchase per user from Jan 25 on). Latest-wins via COALESCE
    * with the update side preferred, and each output row labeled with the
    * MERGE action it took: `updated` (key in both), `inserted` (update
    * only), `carried` (base only). This is the incremental-compaction
    * kernel of a 100 TB table-maintenance pipeline: both sides reduce to
    * ≤ one row per key BEFORE the merge (row_number compiled to
    * WindowGroupLimit), so the full-outer shuffle is bounded by |keys|,
    * never by |events|; on a real lakehouse layout both sides would
    * additionally be bucket-co-located on the merge key. */
  def snapshotMerge(spark: SparkSession, sfDir: String): DataFrame = {
    // µs instants (DuckDB reads TIMESTAMP_NS at µs): 2024-01-10 / 2024-01-25 UTC
    val baseCutUs = 1704844800000000L
    val updCutUs = 1706140800000000L
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), expr("ts div 1000").as("us"),
        col("value"), col("event_id"))
    def latest(df: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us").desc, col("event_id").desc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("us"), col("value"))
    }
    // cutoffs compare raw ts (ns), not the derived µs column, so they reach
    // the parquet scan as PushedFilters and row-group stats prune each side
    val base = latest(ev.filter(col("ts") < lit(baseCutUs * 1000)))
    val upd = latest(ev.filter(col("ts") >= lit(updCutUs * 1000)))
    base.as("b").join(upd.as("u"), col("b.user_id") === col("u.user_id"), "full_outer")
      .select(
        coalesce(col("u.user_id"), col("b.user_id")).as("user_id"),
        coalesce(col("u.us"), col("b.us")).as("last_us"),
        coalesce(col("u.value"), col("b.value")).as("last_value"),
        when(col("u.user_id").isNotNull && col("b.user_id").isNotNull, "updated")
          .when(col("u.user_id").isNotNull, "inserted")
          .otherwise("carried").as("op"))
  }

  /** The orders columns [[tableProfile]] summarizes (every column of the
    * table, in schema order). */
  val ProfileCols: Seq[String] = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  /** ANALYZE-style table statistics: per column, the null count and exact
    * distinct count — the numbers a cost-based optimizer (and a data-quality
    * monitor) collects per table. All distincts compute in ONE pass:
    * Spark plans multiple count_distinct aggregates as a single Expand +
    * aggregate (each input row fans out once per column), so the table is
    * scanned once no matter how many columns are profiled — the ANALYZE
    * TABLE plan shape. At 100 TB the exact distinct shuffle is the cost
    * ceiling; [[graft.operators.TextAnalysis.distinctKmv]] is this
    * engine's sketch alternative when approximate counts suffice. */
  def tableProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val aggs = ProfileCols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
      count_distinct(col(c)).as(s"${c}_distinct")))
    Tables.orders(spark, sfDir)
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(ProfileCols.map(c => struct(
        lit(c).as("col_name"),
        col(s"${c}_nulls").as("n_nulls"),
        col(s"${c}_distinct").as("n_distinct"))): _*)).as("p"))
      .select(col("p.col_name"), col("p.n_nulls"), col("p.n_distinct"))
  }

  val tableProfileSql: String =
    ProfileCols.map(c =>
      s"""SELECT '$c' AS col_name,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct
         |FROM orders""".stripMargin).mkString("\nUNION ALL\n")

  /** TPC-H Q16 analog (supplier-part relationship counts). The testdata has
    * no partsupp table, so the part↔supplier bridge is derived from
    * lineitem — which makes the scale decorrelation visible: the fact table
    * collapses to DISTINCT (partkey, suppkey) pairs FIRST (map-side partial
    * distinct, one pair-key shuffle), so the part join and the blacklist
    * anti-join move |bridge| rows, never |lineitem| rows. The final
    * count(DISTINCT suppkey) re-dedupes at (brand, size) grain because two
    * parts of one brand/size can share a supplier — Spark plans it as the
    * standard Expand two-phase distinct aggregate. At 100 TB every exchange
    * in this plan is bounded by the distinct pair count, not event volume. */
  def q16SupplierCnt(spark: SparkSession, sfDir: String,
      excludeBrand: String = "Brand#1", sizes: Seq[Int] = Seq(5, 10, 15, 20)): DataFrame = {
    val bridge = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey")).dropDuplicates()
    val p = Tables.part(spark, sfDir)
      .filter(col("p_brand") =!= excludeBrand && col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val blacklist = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    bridge
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(blacklist, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_size"))
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** Oracle keeps the textbook NOT IN + straight join form. */
  def q16SupplierCntSql(excludeBrand: String = "Brand#1",
      sizes: Seq[Int] = Seq(5, 10, 15, 20)): String =
    s"""SELECT p_brand, p_size,
       |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE p_brand <> '$excludeBrand' AND p_size IN (${sizes.mkString(", ")})
       |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY p_brand, p_size""".stripMargin

  /** TPC-H Q18 analog (large-volume orders): customers whose single orders
    * accumulate more than `minQty` units. The classic form filters with an
    * IN over a GROUP BY...HAVING subquery and then re-joins lineitem to
    * recompute the sum; here the aggregate is computed ONCE and its value
    * reused — the qualifying set (a handful of orders at any sf; sum-qty
    * p99 is ~270 against the 300 threshold) joins orders/customer directly,
    * so after the one orderkey shuffle for the aggregate, everything
    * downstream is AQE-broadcastable. l_quantity is integral doubles, so
    * the plain double sum is exact at any partial-agg merge order. */
  def q18LargeOrders(spark: SparkSession, sfDir: String, minQty: Double = 300.0): DataFrame = {
    val bigOrders = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    bigOrders
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
  }

  /** Oracle keeps the textbook HAVING-as-IN-filter + recompute form. */
  def q18LargeOrdersSql(minQty: Double = 300.0): String =
    s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       |  sum(l_quantity) AS sum_qty
       |FROM customer, orders, lineitem
       |WHERE o_orderkey IN (
       |    SELECT l_orderkey FROM lineitem
       |    GROUP BY l_orderkey HAVING sum(l_quantity) > $minQty)
       |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
       |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice""".stripMargin

  /** TPC-H Q22 analog (global-customer sales opportunity): per-nation count
    * and total balance of rich-but-inactive customers. Two classic scalar
    * shapes in one plan: the global threshold (mean positive balance) is a
    * 1-row aggregate CROSS-JOINED back in — Spark broadcasts the single row
    * so the "scalar subquery" costs one extra scan and zero shuffles — and
    * the inactivity test is a left-anti join against orders on custkey.
    * The threshold mean goes through the exact-decimal sum and ONE IEEE
    * divide ([[Exact.davg]]), so the > comparison is bit-identical across
    * engines and cluster layouts; the oracle keeps the correlated
    * NOT EXISTS + scalar-subquery textbook form. (Every testdata customer
    * has at least one order, so like [[customersNoOrders]] the inactivity
    * test is "no urgent orders" — Q22's "no orders in 7 years" window.) */
  def q22GlobalBal(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val thr = cust.filter(col("c_acctbal") > 0.0)
      .agg(davg(col("c_acctbal")).as("avg_bal"))
    cust
      .join(broadcast(thr))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
  }

  val q22GlobalBalSql: String =
    s"""SELECT c_nationkey, count(*) AS numcust,
       |  ${sqlSum("c_acctbal")} AS totacctbal
       |FROM customer c
       |WHERE c_acctbal > (
       |    SELECT ${Exact.sqlAvg("c_acctbal")} FROM customer WHERE c_acctbal > 0.0)
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c.c_custkey AND o_orderpriority = '1-URGENT')
       |GROUP BY c_nationkey""".stripMargin

  /** TPC-H Q6 (forecasting revenue change): the purest pushdown showcase —
    * a single-table filter + ungrouped aggregate with NO join and NO
    * grouping key. Every predicate (shipdate range, discount band, quantity
    * cap) is scan-eligible, so the plan is Scan(PushedFilters=[...all
    * five...]) → partial agg → 1-row exchange: at 100 TB the only data
    * movement is one pre-aggregated row per task, and with parquet
    * row-group statistics the shipdate range prunes whole row groups before
    * a byte is decoded. The revenue product routes through [[Exact.dsum]]
    * so the single output value is bit-identical at any partial-merge
    * order. Discount bounds compare binary doubles to exact literals —
    * deterministic in both engines. */
  def q6Forecast(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  val q6ForecastSql: String =
    s"""SELECT ${sqlSum("l_extendedprice * l_discount")} AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
       |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q10 (returned-item reporting): top-20 customers by revenue lost
    * to returns in a quarter. The selective filters live on DIFFERENT
    * tables (returnflag on lineitem, the date window on orders) and both
    * reach their scans before the orderkey join; customer joins only the
    * surviving aggregate input, and nation (fixed 25 rows) is the lone
    * broadcast hint. The final top-k compiles to TakeOrdered — each task
    * keeps its local 20, the driver merges K×tasks rows, no global sort.
    * revenue DESC ties break on c_custkey so the LIMIT frontier is
    * deterministic across engines and partitionings. */
  def q10Returns(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).filter(col("l_returnflag") === "R")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(k)
  }

  def q10ReturnsSql(k: Int = 20): String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
       |  AND l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey ASC LIMIT $k""".stripMargin

  /** TPC-H Q12 analog (shipping-priority audit; the testdata has no
    * l_shipmode/commitdate, so the grain is l_linestatus over a one-year
    * ship window). The point of the shape: BOTH output measures are
    * conditional aggregates over the same join — Spark evaluates the CASE
    * pair inside the map-side partial aggregate, so the orderkey join's
    * output never rematerializes per-measure and the final exchange carries
    * two longs per (task × status). orders prunes to (o_orderkey,
    * o_orderpriority) — ReadSchema shows 2 of 6 columns. */
  def q12Priority(spark: SparkSession, sfDir: String): DataFrame = {
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
  }

  val q12PrioritySql: String =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY l_linestatus""".stripMargin

  /** TPC-H Q15 (top supplier): argmax over an aggregate — the classic
    * "scalar subquery against a derived view" shape. The revenue view is
    * computed ONCE ([[https://spark.apache.org/docs localCheckpoint]];
    * shared-subtree discipline) and consumed twice: a 1-row max aggregate
    * broadcast-crossed back against it (zero shuffles for the comparison,
    * same pattern as [[q22GlobalBal]]'s threshold), then the equality
    * filter's survivors — one row per tying supplier — join the supplier
    * dimension. Revenue is the exact-decimal sum cast back to double, so
    * the max and the = comparison are bit-identical across engines and
    * cluster layouts; ties (multiple max suppliers) surface as multiple
    * rows in both engines rather than an arbitrary pick. */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
      .localCheckpoint()
    rev
      .join(broadcast(rev.agg(max(col("total_revenue")).as("max_rev"))))
      .filter(col("total_revenue") === col("max_rev"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  val q15TopSupplierSql: String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey, ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
       |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin

  /** TPC-H Q19 (discounted revenue, disjunctive predicate): an OR of three
    * brand/size/quantity AND-blocks across the part⋈lineitem join. The
    * shape exists to show what Catalyst does with disjunctions: it derives
    * the single-table residuals — `(qty∈[1,11]) ∨ (qty∈[10,20]) ∨
    * (qty∈[20,30])` pushes to the lineitem scan and the brand/size
    * disjunction to the part scan (both visible in PushedFilters) — so the
    * join only sees rows that could satisfy SOME branch, and the full
    * cross-table disjunction evaluates post-join as a codegen'd residual.
    * At 100 TB that pre-join pruning is the difference between joining the
    * whole fact table and joining ~40% of it. */
  def q19Disjunctive(spark: SparkSession, sfDir: String): DataFrame = {
    val branch = (brand: String, sizeHi: Int, qtyLo: Double, qtyHi: Double) =>
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qtyLo, qtyHi)
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .filter(branch("Brand#12", 5, 1.0, 11.0) ||
        branch("Brand#23", 10, 10.0, 20.0) ||
        branch("Brand#34", 15, 20.0, 30.0))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  val q19DisjunctiveSql: String =
    s"""SELECT ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q21 analog (suppliers who kept orders waiting — the testdata
    * has no commit/receipt dates, so "late" is re-read as "returned"):
    * suppliers whose line on a multi-supplier order came back returned
    * while EVERY other supplier's lines on that order were clean. The
    * hardest textbook shape — EXISTS and NOT EXISTS against the same fact
    * table — and BOTH quantifiers correlate on the same key (the order), so
    * they decorrelate past joins entirely: lineitem collapses ONCE to
    * distinct (orderkey, suppkey, any-returned) participation rows (one
    * pair-key shuffle, map-side partial), then one orderkey window computes
    * per-order supplier and returned-supplier counts, and a returned
    * participation qualifies iff n_suppliers ≥ 2 (the EXISTS) and
    * n_returned = 1 (the row itself is returned, so "no OTHER supplier
    * returned" ⟺ exactly one) — the same two-quantifiers-to-one-window
    * decorrelation as [[ordersAboveCustAvg]], where a first cut compiled
    * them as a left-semi + left-anti join pair (proven equivalent in
    * RelationalSpec, and 4× slower at the sf1 decade: two extra
    * pair-frame shuffles). Every post-collapse exchange moves
    * |participations| rows, never |lineitem| rows; the textbook correlated
    * form the oracle keeps would re-scan the fact per quantifier. */
  def q21Waiting(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_orderkey"))
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("ret"))
      .withColumn("n_suppliers", count(lit(1)).over(w))
      .withColumn("n_returned", sum(col("ret")).over(w))
      .filter(col("ret") === 1L && col("n_suppliers") >= 2L && col("n_returned") === 1L)
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }

  val q21WaitingSql: String =
    """SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait FROM (
      |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R') l1
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_suppkey, s_name""".stripMargin

  /** TPC-H Q2 analog (minimum-cost supplier): the testdata has no partsupp,
    * so the part↔supplier supply relation is derived from lineitem (the
    * [[q16SupplierCnt]] precedent) with the supply cost read as the best
    * unit price the supplier ever shipped the part at. Unit cost is kept as
    * FIXED-POINT int64 — `floor(extendedprice * 10⁴ / quantity)` — because
    * every op in that chain (multiply, divide, floor) is a primitive IEEE
    * double op that is bit-identical across engines, whereas `round()`'s
    * half-way tie handling is implementation-defined (Spark HALF_UP via
    * BigDecimal vs DuckDB's C-library rounding) and here the value feeds an
    * EQUALITY compare, where one ulp would change rows, not just a cell.
    *
    * Shape: the filtered part dimension (a handful of rows after the
    * size+type cut) broadcasts into the fact scan FIRST, so the
    * (part,supplier) pair shuffle carries only matching parts' rows; the
    * region-restricted supplier list is a second broadcast; the correlated
    * `cost = (SELECT min…)` of the textbook form decorrelates to ONE
    * partkey window over the already-collapsed pair frame. Ties (several
    * suppliers at the min) surface as rows in both engines — no LIMIT. */
  def q2MinCost(spark: SparkSession, sfDir: String, size: Int = 15,
      pType: String = "SMALL", region: String = "EUROPE"): DataFrame = {
    val parts = Tables.part(spark, sfDir)
      .filter(col("p_size") === size && col("p_type") === pType)
      .select(col("p_partkey"), col("p_name"))
    val rs = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === region)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("p_partkey"))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("l_suppkey"))
      .agg(min(floor(col("l_extendedprice") * lit(10000.0) / col("l_quantity"))
        .cast("long")).as("cost_fp"))
      .join(broadcast(rs), col("l_suppkey") === col("s_suppkey"))
      .withColumn("min_cost", min(col("cost_fp")).over(w))
      .filter(col("cost_fp") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("cost_fp"))
  }

  /** Oracle keeps the textbook correlated-min form. */
  def q2MinCostSql(size: Int = 15, pType: String = "SMALL",
      region: String = "EUROPE"): String =
    s"""WITH supply AS (
       |  SELECT l_partkey, l_suppkey,
       |    min(CAST(floor(l_extendedprice * 10000.0 / l_quantity) AS BIGINT)) AS cost_fp
       |  FROM lineitem JOIN part ON p_partkey = l_partkey
       |  WHERE p_size = $size AND p_type = '$pType'
       |  GROUP BY 1, 2)
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost_fp
       |FROM supply
       |JOIN part ON p_partkey = l_partkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN nation ON n_nationkey = s_nationkey
       |JOIN region ON r_regionkey = n_regionkey
       |WHERE r_name = '$region'
       |  AND cost_fp = (
       |    SELECT min(s2.cost_fp) FROM supply s2
       |    JOIN supplier ON s_suppkey = s2.l_suppkey
       |    JOIN nation ON n_nationkey = s_nationkey
       |    JOIN region ON r_regionkey = n_regionkey
       |    WHERE s2.l_partkey = supply.l_partkey AND r_name = '$region')""".stripMargin

  /** TPC-H Q9 analog (product-type profit by nation and year): no partsupp
    * means no ps_supplycost, so cost is proxied as 80% of the part's list
    * price (`0.8 * p_retailprice * l_quantity`) — the query keeps Q9's
    * whole point, a multi-dimension profit rollup whose measure needs
    * columns from THREE tables in one expression. The name-filtered part
    * dim broadcasts into the fact scan; the supplier→nation side carries NO
    * hint — supplier is sf-scaled (~1B rows at the 100 TB target), so that
    * join is left to AQE, which broadcasts at small SF and shuffles on
    * l_suppkey at scale. After the joins the only reduction exchange is the
    * final (nation, year) aggregate — ≤ |nations| × |years| rows per task
    * after map-side partials. Profit routes through [[Exact.dsum]]. */
  def q9Profit(spark: SparkSession, sfDir: String, nameToken: String = "widget"): DataFrame = {
    val parts = Tables.part(spark, sfDir)
      .filter(col("p_name").contains(nameToken))
      .select(col("p_partkey"), col("p_retailprice"))
    val supNation = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(supNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).cast("long").as("o_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
        lit(0.8) * col("p_retailprice") * col("l_quantity")).as("sum_profit"))
  }

  def q9ProfitSql(nameToken: String = "widget"): String = {
    // interpolated into LIKE '%token%': Spark's contains() is literal, so
    // LIKE metacharacters (or quotes) in a non-default argument would make
    // the two engines diverge — refuse them instead
    require(nameToken.matches("[a-z0-9 ]+"), s"q9 nameToken must be literal-safe: $nameToken")
    s"""SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount) - 0.8 * p_retailprice * l_quantity")} AS sum_profit
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN nation ON n_nationkey = s_nationkey
       |WHERE p_name LIKE '%$nameToken%'
       |GROUP BY 1, 2""".stripMargin
  }

  /** TPC-H Q11 analog (important stock): with no partsupp availqty, a
    * part's "stock value" is read as the revenue one nation's suppliers
    * shipped of it, and "important" means above a fixed fraction of that
    * nation's total — the HAVING-against-a-scalar-global-aggregate shape.
    * The fraction compare stays EXACT end-to-end: per-part values are
    * decimal sums (never re-rounded through double), and the 1/500
    * threshold is applied as `500 * value > total` — integer-scaled decimal
    * arithmetic both engines compute exactly, where `value > total * 0.002`
    * would put an engine-specific double rounding on the boundary rows.
    * Plan: one broadcast (nation's suppliers) into the fact scan, one
    * partkey shuffle, then the 1-row total broadcast-crossed back against
    * the checkpointed per-part frame ([[q15TopSupplier]] discipline). */
  def q11ImportantPart(spark: SparkSession, sfDir: String,
      nationName: String = "NATION_3", denom: Int = 500): DataFrame = {
    val sup = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === nationName)
      .select(col("s_suppkey"))
    val supVal = Tables.lineitem(spark, sfDir)
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(org.apache.spark.sql.types.DecimalType(24, 6))).as("value_dec"))
      .localCheckpoint()
    supVal
      .join(broadcast(supVal.agg(sum(col("value_dec")).as("total_dec"))))
      .filter(col("value_dec") * lit(denom) > col("total_dec"))
      .select(col("p_partkey"), col("value_dec").cast("double").as("value"))
  }

  def q11ImportantPartSql(nationName: String = "NATION_3", denom: Int = 500): String =
    s"""WITH sup_val AS (
       |  SELECT l_partkey AS p_partkey,
       |    sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS value_dec
       |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN nation ON n_nationkey = s_nationkey
       |  WHERE n_name = '$nationName' GROUP BY 1)
       |SELECT p_partkey, CAST(value_dec AS DOUBLE) AS value
       |FROM sup_val WHERE value_dec * $denom > (SELECT sum(value_dec) FROM sup_val)""".stripMargin

  /** TPC-H Q20 analog (potential part promotion): with no partsupp
    * availqty, "has excess stock to promote" is re-read as "dominates the
    * part's supply" — suppliers who shipped MORE THAN HALF of a part
    * family's total 1995 quantity, counted per supplier. The >½ threshold
    * is deliberate: `0.5 * total` is an exact IEEE scaling of an exact
    * integer-valued double sum (quantities are whole numbers ≪ 2⁵³), so the
    * comparison is engine-independent, and at most one supplier can qualify
    * per part. Plan: name-filtered part broadcast + shipdate range pushed
    * into the fact scan, one (part,supplier) shuffle with map-side
    * partials, a partkey window over the collapsed pair frame (never raw
    * lineitem rows), then the unhinted supplier join AQE resolves (see
    * the inline note — supplier is sf-scaled). */
  def q20PotentialPromo(spark: SparkSession, sfDir: String,
      namePrefix: String = "small ", year0: Int = 1995): DataFrame = {
    val parts = Tables.part(spark, sfDir)
      .filter(col("p_name").startsWith(namePrefix))
      .select(col("p_partkey"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit(s"$year0-01-01").cast("timestamp") &&
        col("l_shipdate") < lit(s"${year0 + 1}-01-01").cast("timestamp"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
      .withColumn("total", sum(col("qty")).over(w))
      .filter(col("qty") > lit(0.5) * col("total"))
      // no broadcast hint: supplier is sf-scaled (10k rows/SF — ~1B at the
      // 100 TB target), so the supplier⋈dominated join is left to AQE, which
      // broadcasts at small SF and shuffles on l_suppkey at scale
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_dominated"))
  }

  def q20PotentialPromoSql(namePrefix: String = "small ", year0: Int = 1995): String = {
    // same literal-safety rule as q9ProfitSql (prefix lands in LIKE 'p%')
    require(namePrefix.matches("[a-z0-9 ]+"), s"q20 namePrefix must be literal-safe: $namePrefix")
    s"""WITH shipped AS (
       |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
       |  FROM lineitem JOIN part ON p_partkey = l_partkey
       |  WHERE p_name LIKE '$namePrefix%'
       |    AND l_shipdate >= TIMESTAMP '$year0-01-01' AND l_shipdate < TIMESTAMP '${year0 + 1}-01-01'
       |  GROUP BY 1, 2)
       |SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_dominated FROM (
       |  SELECT *, sum(qty) OVER (PARTITION BY l_partkey) AS total FROM shipped)
       |JOIN supplier ON s_suppkey = l_suppkey
       |WHERE qty > 0.5 * total
       |GROUP BY 1, 2""".stripMargin
  }

  val snapshotMergeSql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS us, value, event_id
      |  FROM events WHERE event_type = 'purchase'),
      |base AS (SELECT user_id, us, value FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
      |  FROM ev WHERE us < 1704844800000000) WHERE rn = 1),
      |upd AS (SELECT user_id, us, value FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
      |  FROM ev WHERE us >= 1706140800000000) WHERE rn = 1)
      |SELECT coalesce(u.user_id, b.user_id) AS user_id,
      |  coalesce(u.us, b.us) AS last_us,
      |  coalesce(u.value, b.value) AS last_value,
      |  CASE WHEN u.user_id IS NOT NULL AND b.user_id IS NOT NULL THEN 'updated'
      |       WHEN u.user_id IS NOT NULL THEN 'inserted'
      |       ELSE 'carried' END AS op
      |FROM base b FULL OUTER JOIN upd u ON b.user_id = u.user_id""".stripMargin
}
