package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality audit over the star schema — the Deequ/constraint-check
  * stage a production pipeline runs before any training-data draw trusts
  * its joins.
  *
  * One row per foreign-key edge: child cardinality, distinct child keys,
  * orphaned child rows (FK value with no parent — a join would silently
  * drop them), and unreferenced parents (dimension rows no fact touches).
  * A clean corpus audits to zeros in the violation columns; the point of
  * the operator is that the *same plan* surfaces the counts when ingest
  * breaks.
  *
  * 100 TB shape: per edge, child rows collapse to per-key counts FIRST
  * (one map-side-combined aggregation bounded by |distinct keys|), parents
  * collapse to per-key counts likewise, and BOTH violation checks come out
  * of ONE full-outer key join + ONE aggregate per edge (a full-outer join
  * cannot broadcast — it runs as a key-partitioned SMJ/SHJ — but its
  * inputs are per-key counts, never fact rows, so the shuffle is bounded
  * by |distinct keys| a side). The seven per-edge profiles are independent
  * single-row aggregates unioned at the end (each runs as its own tiny
  * stage — on a cluster they schedule concurrently).
  */
object Audit {

  private case class Edge(name: String, child: String, childKey: String,
                          parent: String, parentKey: String)

  private val edges = Seq(
    Edge("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    Edge("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    Edge("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    Edge("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    Edge("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    Edge("supplier.s_nationkey->nation.n_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
    Edge("nation.n_regionkey->region.r_regionkey", "nation", "n_regionkey", "region", "r_regionkey"))

  /** Referential-integrity profile of every FK edge in the testdata schema.
    *
    * Each child TABLE is scanned once, not once per edge: a table's edges
    * (lineitem carries three) explode to (edge, key) pairs inside the scan
    * stage, and one map-side-combined aggregation yields every edge's
    * per-key counts together. At 100 TB the fact scan is the dominant cost,
    * so this is a 3× IO cut for lineitem vs the per-edge formulation; the
    * shuffle is unchanged — partial aggregation collapses the exploded rows
    * to the same |distinct keys| per edge the separate plans would move. */
  def fkIntegrity(spark: SparkSession, sfDir: String): DataFrame =
    edges.groupBy(_.child).toSeq.sortBy(_._1).flatMap { case (child, es) =>
      val pairs = es.map(e =>
        struct(lit(e.name).as("fk"), col(e.childKey).cast("long").as("k")))
      val perKeyAll = Tables.table(spark, sfDir, child)
        .select(explode(array(pairs: _*)).as("x"))
        .groupBy(col("x.fk").as("fk"), col("x.k").as("k"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(eager = false) // one lazy block per child table, shared by its edges
      es.map { e =>
        profileOfPerKey(
          perKeyAll.filter(col("fk") === e.name).select(col("k"), col("n")),
          Tables.table(spark, sfDir, e.parent)
            .select(col(e.parentKey).cast("long").as("p")),
          e.name)
      }
    }.reduce(_.unionAll(_))

  /** The per-edge profile over any child/parent pair (spec entry point).
    * Checkpoints here — NOT in [[profileOfPerKey]] — because [[fkIntegrity]]
    * already materializes its shared per-child block; a second checkpoint of
    * each edge's filtered view would duplicate the block storage. Lazy for
    * the same reason as there: materialize inside the downstream action. */
  private[graft] def edgeProfileOn(child: DataFrame, childKey: String,
                                   parent: DataFrame, parentKey: String,
                                   name: String): DataFrame =
    profileOfPerKey(
      child.groupBy(col(childKey).as("k")).agg(count(lit(1)).as("n"))
        .localCheckpoint(eager = false),
      parent.select(col(parentKey).as("p")), name)

  /** Violation checks over an already-collapsed AND already-materialized
    * (key, row-count) child side, as ONE full-outer join + ONE aggregate
    * (optimization round 13; previously a stats aggregate + two anti-joins
    * + two cross-joins per edge — 3 aggregates and 2 joins re-reading each
    * side, ~5 extra stages per edge × 7 edges in the plan). Parents first
    * collapse to per-key row counts (so a duplicated parent key cannot fan
    * out child rows), then:
    *   - p NULL  ⇔ the child key matches no parent row → its n rows are
    *     orphans (a NULL child key never equality-matches — same as the
    *     oracle's NOT EXISTS);
    *   - k NULL  ⇔ the parent key matches no child row → its pn parent
    *     rows are unreferenced (a NULL parent key likewise never matches).
    * Values are identical to the anti-join form on any input; the crafted
    * NULL/orphan/unreferenced spec (AuditSpec) pins the equivalence. */
  private def profileOfPerKey(perKey: DataFrame, parents: DataFrame,
                              name: String): DataFrame = {
    val parentsByKey = parents.groupBy(col("p")).agg(count(lit(1)).as("pn"))
    perKey.join(parentsByKey, col("k") === col("p"), "full_outer")
      .agg(
        sum(col("n")).as("child_rows"),
        count(col("k")).as("distinct_child_keys"), // count(col) skips NULL-key groups, matching COUNT(DISTINCT)
        coalesce(sum(when(col("p").isNull, col("n"))), lit(0L)).as("orphan_rows"),
        coalesce(sum(when(col("k").isNull, col("pn"))), lit(0L)).as("unreferenced_parents"))
      .select(lit(name).as("fk"), col("child_rows"), col("distinct_child_keys"),
        col("orphan_rows"), col("unreferenced_parents"))
  }

  val fkIntegritySql: String = edges.map { e =>
    s"""SELECT '${e.name}' AS fk,
       | (SELECT count(*) FROM ${e.child}) AS child_rows,
       | (SELECT count(DISTINCT ${e.childKey}) FROM ${e.child}) AS distinct_child_keys,
       | (SELECT count(*) FROM ${e.child} c
       |   WHERE NOT EXISTS (SELECT 1 FROM ${e.parent} p WHERE p.${e.parentKey} = c.${e.childKey})) AS orphan_rows,
       | (SELECT count(*) FROM ${e.parent} p
       |   WHERE NOT EXISTS (SELECT 1 FROM ${e.child} c WHERE c.${e.childKey} = p.${e.parentKey})) AS unreferenced_parents""".stripMargin
  }.mkString("\nUNION ALL\n")

  /** ROW-level data-quality gate — the per-row twin of the table-level
    * [[fkIntegrity]] audit (Deequ's Check vs Analyzer split): every
    * ingest-validation rule evaluates as a conditional counter inside ONE
    * map-side-combined aggregation over ONE scan — the 100 TB shape where
    * per-rule passes (or a quarantine anti-join per rule) would multiply
    * fact IO by |rules|. The single stat row then unpivots to one row per
    * rule via `stack` (constant-width, no shuffle), with the violation
    * rate in integer ppm so the output is hash-portable. The testdata
    * REALLY violates the user-id rule (zero ids — no negatives or NULLs in
    * the generated data; those halves of the predicate are covered by
    * AuditSpec's crafted-violation rows), so the gate's counting is
    * oracle-verified on live violations, not just zeros. */
  def rowQualityGate(spark: SparkSession, sfDir: String): DataFrame = {
    val knownTypes = Seq("click", "signup", "error", "view", "purchase")
    def viol(c: Column) = sum(when(c, 1L).otherwise(0L))
    val lowNs = 946684800L * 1000000000L // 2000-01-01
    val highNs = 2051222400L * 1000000000L // 2035-01-01
    Tables.events(spark, sfDir).agg(
        count(lit(1)).as("total"),
        viol(col("user_id").isNull || col("user_id") <= 0).as("r1"),
        viol(col("value").isNull || col("value") < 0).as("r2"),
        viol(!col("event_type").isin(knownTypes.map(lit): _*)).as("r3"),
        viol(col("ts") < lowNs || col("ts") >= highNs).as("r4"))
      .select(expr(
        """stack(4,
          |  'null_or_nonpositive_user', r1,
          |  'negative_or_null_value', r2,
          |  'unknown_event_type', r3,
          |  'ts_outside_2000_2035', r4) AS (rule, n_violations)""".stripMargin),
        col("total"))
      .withColumn("violation_ppm", expr("n_violations * 1000000 div total"))
  }

  val rowQualityGateSql: String =
    """WITH agg AS (SELECT count(*) AS total,
      |  sum(CASE WHEN user_id IS NULL OR user_id <= 0 THEN 1 ELSE 0 END) AS r1,
      |  sum(CASE WHEN value IS NULL OR value < 0 THEN 1 ELSE 0 END) AS r2,
      |  sum(CASE WHEN event_type NOT IN ('click','signup','error','view','purchase') THEN 1 ELSE 0 END) AS r3,
      |  sum(CASE WHEN epoch_us(ts) < 946684800000000 OR epoch_us(ts) >= 2051222400000000 THEN 1 ELSE 0 END) AS r4
      |  FROM events),
      |rules AS (
      |  SELECT 'null_or_nonpositive_user' AS rule, r1 AS n_violations, total FROM agg
      |  UNION ALL SELECT 'negative_or_null_value', r2, total FROM agg
      |  UNION ALL SELECT 'unknown_event_type', r3, total FROM agg
      |  UNION ALL SELECT 'ts_outside_2000_2035', r4, total FROM agg)
      |SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
      |  CAST(total AS BIGINT) AS total,
      |  CAST(n_violations * 1000000 // total AS BIGINT) AS violation_ppm
      |FROM rules""".stripMargin

  /** JOIN-SIZE ESTIMATION from mergeable sketches — the optimizer-statistics
    * shape: how many distinct `events.user_id` values will actually match
    * `customer.c_custkey`, answered WITHOUT joining the tables, from two
    * k-long KMV sketches (k = [[TextAnalysis.KmvK]] hashes per side — what
    * a 1000-executor cluster would ship to the planner, not the key sets).
    * Estimator (Beyer et al. 2007): union sketch = k smallest distinct
    * hashes of S_A ∪ S_B, union_est from its k-th value (small-range rule
    * below k), and inter_est = union_est · |union-sketch members present in
    * BOTH side sketches| div |union sketch| — the Jaccard-from-KMV scale-up,
    * all in the repo's portable integer arithmetic so the DuckDB oracle
    * hash-matches. The EXACT distinct/intersection counts ride alongside as
    * the validation columns (affordable at oracle scale; the sketch is the
    * 100 TB answer). Side sketches are TakeOrderedAndProject (per-partition
    * top-k, then a k-row merge — never a global sort); every crossJoin
    * below carries a broadcast 1-row aggregate. */
  def joinCardinalityKmv(spark: SparkSession, sfDir: String): DataFrame = {
    val k = TextAnalysis.KmvK
    val a = Tables.events(spark, sfDir).filter(col("user_id").isNotNull)
      .select(Hashing.md5Long(col("user_id").cast("string")).as("h")).distinct()
      .localCheckpoint() // sketch + exact counts + exact intersection all read it
    val b = Tables.customer(spark, sfDir)
      .select(Hashing.md5Long(col("c_custkey").cast("string")).as("h")).distinct()
      .localCheckpoint()
    val sa = a.orderBy(col("h")).limit(k).localCheckpoint()
    val sb = b.orderBy(col("h")).limit(k).localCheckpoint()
    val su = sa.union(sb).distinct().orderBy(col("h")).limit(k).localCheckpoint()
    val both = su
      .join(sa.select(col("h").as("ha")), col("h") === col("ha"), "left_semi")
      .join(sb.select(col("h").as("hb")), col("h") === col("hb"), "left_semi")
    val exactI = a.join(b.select(col("h").as("hb")), col("h") === col("hb"), "left_semi")
      .agg(count(lit(1)).as("n_i"))
    a.agg(count(lit(1)).as("n_a"))
      .crossJoin(broadcast(b.agg(count(lit(1)).as("n_b"))))
      .crossJoin(broadcast(exactI))
      .crossJoin(broadcast(su.agg(count(lit(1)).as("u_n"), max(col("h")).as("u_kth"))))
      .crossJoin(broadcast(both.agg(count(lit(1)).as("n_both"))))
      .select(
        col("n_a").as("n_a_exact"), col("n_b").as("n_b_exact"),
        (col("n_a") + col("n_b") - col("n_i")).as("n_union_exact"),
        col("n_i").as("n_inter_exact"),
        expr(s"CASE WHEN u_n < $k THEN u_n ELSE ${TextAnalysis.KmvNumerator}L div u_kth END")
          .as("union_est"),
        expr(s"n_both * (CASE WHEN u_n < $k THEN u_n ELSE ${TextAnalysis.KmvNumerator}L div u_kth END) div u_n")
          .as("inter_est"))
  }

  /** BLOOM-FILTER SEMI-JOIN PRUNING with exact false-positive accounting —
    * the runtime-filter shape that decides 100 TB join cost: build a bitmap
    * from the SELECTIVE side (suppliers in one region, |keys| ~ S/5), ship
    * it to the fact scan, and kill probe rows BEFORE the shuffle. Spark's
    * own runtime bloom filter does exactly this opaquely
    * (BloomProbeSpec pins the injection); this operator is the
    * WHITE-BOX twin — same md5-slice hash family in both engines, so the
    * DuckDB oracle verifies the filter's exact contents, candidate set,
    * and false-positive count rather than trusting an opaque sketch.
    *
    * Portable construction: h = [[Hashing.md5Long]](key) (56 uniform
    * bits); the bitmap SELF-SIZES to m = next-pow-2(8·n_build) — 8+
    * bits/key makes the FP rate scale-INVARIANT (~4–5% at k=2 slices) from
    * sf0.001 to 100 TB instead of saturating when the build side grows;
    * slice j's position is `(h div m^j) mod m` (k·log2(m) ≤ 56 bits up to
    * m = 2^28). A probe key passes iff BOTH slice positions are occupied.
    *
    * Shape: the bitmap is ≤ m distinct positions — a broadcast
    * build-side; the probe's distinct keys collapse FIRST (map-side
    * combine, |distinct suppkey| rows), explode to k=2 (slot, pos) rows,
    * and survive via a broadcast inner join + count(slots)=k — the fact
    * table itself is touched once for per-key row counts and never
    * shuffles on anything wider than its key. Every crossJoin below
    * broadcasts a 1-row aggregate. Output is one summary row: filter
    * geometry, key-level candidates/true/false-positives, and row-level
    * pruned counts — the numbers a planner needs to decide whether
    * shipping the filter pays. */
  def bloomSemijoinPrune(spark: SparkSession, sfDir: String): DataFrame = {
    val bitsPerKey = 8
    val nat = Tables.nation(spark, sfDir).select(col("n_nationkey"), col("n_regionkey"))
    val reg = Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE")
      .select(col("r_regionkey"))
    val build = Tables.supplier(spark, sfDir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey").cast("long").as("bk")).distinct()
      .localCheckpoint() // sizing count + bitmap + exact-truth join all read it
    // greatest(n,1): an empty build side must still yield a well-formed
    // (everything-prunes) filter, not bin(-1) garbage.
    val mRow = build.agg(count(lit(1)).as("n_build"))
      .select(col("n_build"),
        expr(s"CAST(shiftleft(1L, length(bin($bitsPerKey * greatest(n_build, 1L) - 1))) AS BIGINT)").as("m"))
    val bits = build.crossJoin(broadcast(mRow))
      .select(Hashing.md5Long(col("bk").cast("string")).as("h"), col("m"))
      .select(explode(expr("array(h % m, (h div m) % m)")).as("pos"))
      .distinct()
      .localCheckpoint() // the bitmap: ≤ m rows, broadcast to every probe task
    // Fact side: collapse to per-key row counts first — the ONLY fact-wide
    // aggregation; everything after moves |distinct keys| rows.
    val perKey = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_suppkey").cast("long").as("pk"))
      .agg(count(lit(1)).as("nr"))
      .localCheckpoint()
    val probed = perKey.crossJoin(broadcast(mRow))
      .select(col("pk"), col("nr"), Hashing.md5Long(col("pk").cast("string")).as("h"), col("m"))
      .select(col("pk"), col("nr"),
        explode(expr("array(h % m, (h div m) % m)")).as("pos"))
    val candidates = probed
      .join(broadcast(bits), Seq("pos"))
      .groupBy(col("pk"), col("nr")).agg(count(lit(1)).as("slots_hit"))
      .filter(col("slots_hit") === 2)
      .select(col("pk"), col("nr"))
      .localCheckpoint()
    val trueKeys = perKey.join(build, col("pk") === col("bk"), "left_semi")
    mRow.select(col("n_build").as("n_build_keys"), col("m").as("m_bits"))
      .crossJoin(broadcast(bits.agg(count(lit(1)).as("n_bits_set"))))
      .crossJoin(broadcast(perKey.agg(
        count(lit(1)).as("n_probe_keys"), sum(col("nr")).as("n_probe_rows"))))
      .crossJoin(broadcast(candidates.agg(
        count(lit(1)).as("n_candidate_keys"),
        coalesce(sum(col("nr")), lit(0L)).as("n_rows_pass"))))
      .crossJoin(broadcast(trueKeys.agg(
        count(lit(1)).as("n_true_keys"),
        coalesce(sum(col("nr")), lit(0L)).as("n_rows_true"))))
      .select(col("n_build_keys"), col("m_bits"), col("n_bits_set"),
        col("n_probe_keys"), col("n_candidate_keys"), col("n_true_keys"),
        (col("n_candidate_keys") - col("n_true_keys")).as("n_fp_keys"),
        col("n_probe_rows"), col("n_rows_pass"), col("n_rows_true"),
        // Zero-guarded ratios: DuckDB errors on `// 0` while Spark's `div`
        // yields NULL — a CASE keeps the two engines in lockstep on a
        // drifted dataset where every probe key matches (or probe is empty).
        expr("""CASE WHEN n_probe_keys - n_true_keys = 0 THEN 0L
               |ELSE (n_candidate_keys - n_true_keys) * 1000000 div (n_probe_keys - n_true_keys)
               |END""".stripMargin).as("fp_keys_ppm"),
        expr("""CASE WHEN n_probe_rows = 0 THEN 0L
               |ELSE (n_probe_rows - n_rows_pass) * 1000000 div n_probe_rows
               |END""".stripMargin).as("rows_pruned_ppm"))
  }

  def bloomSemijoinPruneSql: String = {
    val h = (e: String) => Hashing.md5LongSql(e)
    s"""WITH build AS (
       |  SELECT DISTINCT CAST(s_suppkey AS BIGINT) AS bk
       |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
       |  JOIN region r ON n.n_regionkey = r.r_regionkey
       |  WHERE r.r_name = 'EUROPE'),
       |geom AS (SELECT count(*) AS n_build,
       |  CAST(1::BIGINT << length(bin(8 * greatest(count(*), 1) - 1)) AS BIGINT) AS m FROM build),
       |bits AS (
       |  SELECT DISTINCT pos FROM (
       |    SELECT ${h("CAST(bk AS VARCHAR)")} % (SELECT m FROM geom) AS pos FROM build
       |    UNION ALL
       |    SELECT (${h("CAST(bk AS VARCHAR)")} // (SELECT m FROM geom))
       |           % (SELECT m FROM geom) FROM build)),
       |per_key AS (
       |  SELECT CAST(l_suppkey AS BIGINT) AS pk, count(*) AS nr
       |  FROM lineitem GROUP BY 1),
       |cand AS (
       |  SELECT pk, nr FROM per_key
       |  WHERE ${h("CAST(pk AS VARCHAR)")} % (SELECT m FROM geom) IN (SELECT pos FROM bits)
       |    AND (${h("CAST(pk AS VARCHAR)")} // (SELECT m FROM geom))
       |        % (SELECT m FROM geom) IN (SELECT pos FROM bits)),
       |tru AS (SELECT pk, nr FROM per_key WHERE pk IN (SELECT bk FROM build)),
       |s AS (SELECT
       |  (SELECT n_build FROM geom) AS n_build_keys,
       |  (SELECT m FROM geom) AS m_bits,
       |  (SELECT count(*) FROM bits) AS n_bits_set,
       |  (SELECT count(*) FROM per_key) AS n_probe_keys,
       |  (SELECT count(*) FROM cand) AS n_candidate_keys,
       |  (SELECT count(*) FROM tru) AS n_true_keys,
       |  (SELECT coalesce(sum(nr), 0) FROM per_key) AS n_probe_rows,
       |  (SELECT coalesce(sum(nr), 0) FROM cand) AS n_rows_pass,
       |  (SELECT coalesce(sum(nr), 0) FROM tru) AS n_rows_true)
       |SELECT CAST(n_build_keys AS BIGINT) AS n_build_keys,
       |  CAST(m_bits AS BIGINT) AS m_bits, CAST(n_bits_set AS BIGINT) AS n_bits_set,
       |  CAST(n_probe_keys AS BIGINT) AS n_probe_keys,
       |  CAST(n_candidate_keys AS BIGINT) AS n_candidate_keys,
       |  CAST(n_true_keys AS BIGINT) AS n_true_keys,
       |  CAST(n_candidate_keys - n_true_keys AS BIGINT) AS n_fp_keys,
       |  CAST(n_probe_rows AS BIGINT) AS n_probe_rows,
       |  CAST(n_rows_pass AS BIGINT) AS n_rows_pass,
       |  CAST(n_rows_true AS BIGINT) AS n_rows_true,
       |  CAST(CASE WHEN n_probe_keys - n_true_keys = 0 THEN 0
       |       ELSE (n_candidate_keys - n_true_keys) * 1000000 // (n_probe_keys - n_true_keys)
       |       END AS BIGINT) AS fp_keys_ppm,
       |  CAST(CASE WHEN n_probe_rows = 0 THEN 0
       |       ELSE (n_probe_rows - n_rows_pass) * 1000000 // n_probe_rows
       |       END AS BIGINT) AS rows_pruned_ppm
       |FROM s""".stripMargin
  }

  def joinCardinalityKmvSql: String = {
    val k = TextAnalysis.KmvK
    val num = TextAnalysis.KmvNumerator
    val ha = Hashing.md5LongSql("CAST(user_id AS VARCHAR)")
    val hb = Hashing.md5LongSql("CAST(c_custkey AS VARCHAR)")
    s"""WITH a AS (SELECT DISTINCT $ha AS h FROM events WHERE user_id IS NOT NULL),
       |b AS (SELECT DISTINCT $hb AS h FROM customer),
       |sa AS (SELECT h FROM a ORDER BY h LIMIT $k),
       |sb AS (SELECT h FROM b ORDER BY h LIMIT $k),
       |su AS (SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb)
       |       ORDER BY h LIMIT $k),
       |m AS (SELECT
       |    (SELECT count(*) FROM a) AS n_a,
       |    (SELECT count(*) FROM b) AS n_b,
       |    (SELECT count(*) FROM a WHERE h IN (SELECT h FROM b)) AS n_i,
       |    (SELECT count(*) FROM su) AS u_n,
       |    (SELECT max(h) FROM su) AS u_kth,
       |    (SELECT count(*) FROM su
       |     WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb)) AS n_both)
       |SELECT CAST(n_a AS BIGINT) AS n_a_exact, CAST(n_b AS BIGINT) AS n_b_exact,
       |  CAST(n_a + n_b - n_i AS BIGINT) AS n_union_exact,
       |  CAST(n_i AS BIGINT) AS n_inter_exact,
       |  CAST(CASE WHEN u_n < $k THEN u_n ELSE $num // u_kth END AS BIGINT) AS union_est,
       |  CAST(n_both * (CASE WHEN u_n < $k THEN u_n ELSE $num // u_kth END) // u_n
       |       AS BIGINT) AS inter_est
       |FROM m""".stripMargin
  }
}
