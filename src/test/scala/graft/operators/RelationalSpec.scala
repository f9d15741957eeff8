package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

/** Semantic checks for the round-3 relational/join-shape operators: each
  * scale-shaped formulation is proven equal to the naive formulation it
  * replaces (bin-bucketed interval join vs raw range join, window
  * decorrelation vs self-join), and the MERGE/sketch invariants hold. */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"
  private val Sf01 = "/root/testdata/sf0.01"

  test("sessionConcurrency equals the naive range join it replaces") {
    val binned = EventOps.sessionConcurrency(spark, Sf)
    // Naive twin: the SAME shared session base (so the test isolates the
    // join strategy), raw BETWEEN join — plans as a nested loop, fine at
    // sf0.001, the thing the bin bucketing exists to avoid at scale.
    val sessions = EventOps.sessionLabeled(spark, Sf, gapMinutes = 30)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"))
    val naive = Tables.events(spark, Sf)
      .filter(col("event_type") === "error")
      .select(col("event_id"), expr("ts div 1000").as("us"))
      .join(sessions, col("us") >= col("start_us") && col("us") <= col("end_us"))
      .groupBy(col("event_id")).agg(count(lit(1)).as("n_open_sessions"))
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }

  test("q13OrderDist: distribution totals |customer|; zero bucket equals the anti-join count") {
    val dist = Relational.q13OrderDist(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nCust = Tables.customer(spark, Sf).count()
    assert(dist.values.sum === nCust) // every customer lands in exactly one bucket
    val zeroOrder = Tables.customer(spark, Sf).select(col("c_custkey"))
      .join(Tables.orders(spark, Sf).filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(dist.getOrElse(0L, 0L) === zeroOrder)
    // Cross-check one non-zero bucket against a direct per-customer count.
    val perCust = Tables.orders(spark, Sf)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey")).count()
      .groupBy(col("count")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    perCust.foreach { case (bucket, n) => assert(dist(bucket) === n) }
  }

  test("ordersAboveCustAvg equals the self-join decorrelation") {
    val windowed = Relational.ordersAboveCustAvg(spark, Sf)
    val perCust = Tables.orders(spark, Sf)
      .groupBy(col("o_custkey").as("ck"))
      .agg((sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(24, 2)))
        .cast("double") / count(lit(1))).as("cust_avg"))
    val joined = Tables.orders(spark, Sf)
      .join(perCust, col("o_custkey") === col("ck"))
      .filter(col("o_totalprice") > lit(1.5) * col("cust_avg"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("cust_avg"))
    assert(windowed.exceptAll(joined).isEmpty && joined.exceptAll(windowed).isEmpty)
  }

  test("snapshotMerge covers all three MERGE actions at sf0.01") {
    val ops = Relational.snapshotMerge(spark, Sf01)
      .groupBy(col("op")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops.keySet === Set("updated", "inserted", "carried"),
      s"expected updated/inserted/carried all present, got $ops")
    // keys must be unique after the merge (it IS a snapshot)
    val merged = Relational.snapshotMerge(spark, Sf01)
    assert(merged.select("user_id").distinct().count() === merged.count())
  }

  test("customerValueProfile keeps zero-order customers with explicit zeros") {
    val prof = Relational.customerValueProfile(spark, Sf)
    assert(prof.count() === Tables.customer(spark, Sf).count(),
      "left join must preserve every customer")
    val zeros = prof.filter(col("n_big") === 0)
    assert(zeros.count() > 0, "sf0.001 should have customers without 300k orders")
    assert(zeros.filter(col("big_spend") =!= 0.0).count() === 0)
  }

  test("clickMinusPurchaseAll has bag semantics: per-key max(0, clicks - purchases)") {
    val got = EventOps.clickMinusPurchaseAll(spark, Sf)
      .groupBy(col("user_id"), col("hour_epoch")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def counts(tpe: String) = Tables.events(spark, Sf)
      .filter(col("event_type") === tpe)
      .groupBy(col("user_id"), expr("((ts - pmod(ts, 3600000000000)) div 3600000000000) * 3600").as("h"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val clicks = counts("click"); val purchases = counts("purchase")
    val expected = clicks.flatMap { case (k, c) =>
      val d = c - purchases.getOrElse(k, 0L)
      if (d > 0) Some(k -> d) else None
    }
    assert(got === expected)
  }

  test("tableProfile distincts equal per-column distinct counts") {
    val prof = Relational.tableProfile(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val orders = Tables.orders(spark, Sf)
    assert(prof.keySet === Relational.ProfileCols.toSet)
    Relational.ProfileCols.foreach { c =>
      assert(prof(c)._2 === orders.select(c).distinct().count(), s"n_distinct($c)")
      assert(prof(c)._1 === orders.filter(col(c).isNull).count(), s"n_nulls($c)")
    }
  }

  test("distinctKmv: estimator within 3-sigma of exact; small groups exact") {
    val rows = TextAnalysis.distinctKmv(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      if (exact < TextAnalysis.KmvK) assert(est === exact, s"small-range rule: $r")
      else {
        // KMV relative error ~ 1/sqrt(k-2) ≈ 12.7% at k=64; 3σ bound
        val relErr = math.abs(est - exact).toDouble / exact
        assert(relErr < 0.40, s"KMV estimate off by ${relErr * 100}%: $r")
      }
    }
  }

  test("hllDistinct equals a driver re-derivation; ALL row is the register max-merge") {
    val m = TextAnalysis.HllM
    val raw = Tables.events(spark, Sf).filter(col("event_id").isNotNull)
      .select(col("event_type"), col("event_id").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val ids = raw.map { case (t, id) => (t, Hashing.md5LongJvm(id)) }
    def rho(h: Long): Long = {
      val x = h / m
      if (x == 0) TextAnalysis.HllRhoMax.toLong
      else math.min(java.lang.Long.numberOfTrailingZeros(x) + 1L, TextAnalysis.HllRhoMax.toLong)
    }
    def estimate(regs: Map[Long, Long]): (Long, Long) = {
      val z = (m - regs.size) * (1L << 45) + regs.values.map(r => 1L << (45 - r)).sum
      (TextAnalysis.HllNumerator / z, regs.size.toLong)
    }
    val perType = ids.groupBy(_._1).map { case (t, rows) =>
      t -> rows.groupBy(x => x._2 % m).map { case (b, xs) => b -> xs.map(x => rho(x._2)).max }
    }
    // merged sketch: max per register across the per-type sketches
    val mergedRegs = perType.values.flatten
      .groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    // merge property: identical to sketching the union stream directly
    val directRegs = ids.groupBy(x => x._2 % m)
      .map { case (b, xs) => b -> xs.map(x => rho(x._2)).max }
    assert(mergedRegs === directRegs)
    val got = TextAnalysis.hllDistinct(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    perType.foreach { case (t, regs) =>
      val (est, used) = estimate(regs)
      val exact = raw.filter(_._1 == t).map(_._2).distinct.length.toLong
      assert(got(t) === ((exact, est, used)), s"scope $t")
    }
    val (estAll, usedAll) = estimate(mergedRegs)
    assert(got("ALL") === ((raw.map(_._2).distinct.length.toLong, estAll, usedAll)))
  }

  test("hllDistinct: an event_type literally named 'ALL' cannot collide with the merged row") {
    import spark.implicits._
    // 3 ids under type 'ALL', 2 under 'click', 1 shared across both →
    // merged exact = 4. Before the `merged` key column, the display
    // string doubled as the join key and this corpus cross-matched.
    val evs = Seq(
      ("ALL", 1L), ("ALL", 2L), ("ALL", 3L),
      ("click", 3L), ("click", 4L)
    ).toDF("event_type", "event_id")
    val rows = TextAnalysis.hllDistinctOf(evs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.size === 3, s"expected type-ALL, type-click, merged rows: $rows")
    assert(rows(("ALL", 0L)) === 3L, "per-type 'ALL' exact count")
    assert(rows(("click", 0L)) === 2L)
    assert(rows(("ALL", 1L)) === 4L, "merged exact count over distinct ids")
  }

  test("hllDistinct: estimate within 3-sigma in its contract regime (n >> m, sf0.01)") {
    val rows = TextAnalysis.hllDistinct(spark, "/root/testdata/sf0.01").collect()
    val all = rows.find(r => r.getString(0) == "ALL" && r.getLong(1) == 1L).get
    val (exact, est) = (all.getLong(2), all.getLong(3))
    assert(exact >= 19 * TextAnalysis.HllM, "corpus drifted out of the n >> m regime")
    // HLL standard error 1.04/sqrt(512) ≈ 4.6%; 3σ ≈ 13.8%
    val relErr = math.abs(est - exact).toDouble / exact
    assert(relErr < 0.138, s"HLL estimate off by ${relErr * 100}%: exact=$exact est=$est")
  }

  test("KMV sketches MERGE: unioning per-group k-min sets equals sketching the union") {
    // Mergeability is the property that makes KMV a 1000-executor sketch:
    // each partition ships its k smallest hashes, and re-taking the k
    // smallest of the union is EXACTLY the sketch of the combined stream.
    val k = TextAnalysis.KmvK
    val perLang = Tables.documents(spark, Sf)
      .select(col("lang"), TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("lang"),
        explode(graft.functions.ShinglesExpression.word_shingles(col("t"), 3)).as("s"))
      .select(col("lang"), Hashing.md5Long(col("s")).as("h"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    def estimate(hashes: Seq[Long]): Long = {
      val d = hashes.distinct.sorted
      if (d.size < k) d.size.toLong
      else TextAnalysis.KmvNumerator / d(k - 1)
    }
    // merged: each language contributes ONLY its k smallest (its sketch)
    val merged = estimate(
      perLang.groupBy(_._1).values.flatMap(_.map(_._2).sorted.take(k)).toSeq)
    val direct = estimate(perLang.map(_._2).toSeq)
    assert(merged === direct,
      "merging per-group sketches must equal sketching the union")
  }

  test("lmScore: scores are valid fixed-point probabilities; bigram counts check out") {
    val scored = Curation.lmScore(spark, Sf)
    assert(scored.filter(col("lm_score_fp") <= 0 ||
      col("lm_score_fp") > Curation.LmScale).count() === 0,
      "mean smoothed transition prob must be in (0, 1] fixed-point")
    // n_bigrams per doc = token count - 1 (every adjacent pair counted)
    val toks = Tables.documents(spark, Sf)
      .select(col("doc_id"), (size(TextOps.tokens(col("text"))) - 1).cast("long").as("want"))
      .filter(col("want") >= 1)
    val bad = scored.join(toks, "doc_id").filter(col("n_bigrams") =!= col("want"))
    assert(bad.count() === 0)
    assert(scored.count() === toks.count(), "every doc with >=2 tokens is scored")
  }

  // ---- round-5 TPC-H shapes ----

  test("q6: all five predicates reach the lineitem scan (PushedFilters)") {
    val plan = Relational.q6Forecast(spark, Sf).queryExecution.executedPlan.toString
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(raw"PushedFilters: \[[^\]]*$c".r.findFirstIn(plan).nonEmpty,
        s"$c predicate must push to the parquet scan\n$plan")
    assert(Relational.q6Forecast(spark, Sf).count() === 1)
  }

  test("q10: top-k compiles to TakeOrdered, never a global sort") {
    val q = Relational.q10Returns(spark, Sf, k = 5)
    assert(q.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "LIMIT after ORDER BY must plan as TakeOrderedAndProject")
    // the k-frontier is deterministic: re-running yields the identical rows
    assert(q.exceptAll(Relational.q10Returns(spark, Sf, k = 5)).isEmpty)
  }

  test("q12: conditional-aggregate pair partitions the joined rows exactly") {
    val r = Relational.q12Priority(spark, Sf).collect()
    val joined = Tables.lineitem(spark, Sf)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, Sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(r.map(x => x.getLong(1) + x.getLong(2)).sum === joined,
      "high + low must partition every joined line exactly once")
  }

  test("q15 equals the window-max twin (and keeps ALL argmax ties)") {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val rev = Tables.lineitem(spark, Sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("total_revenue"))
    val twin = rev.withColumn("mx", max(col("total_revenue")).over(w))
      .filter(col("total_revenue") === col("mx"))
      .join(Tables.supplier(spark, Sf), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    val q = Relational.q15TopSupplier(spark, Sf)
    assert(q.exceptAll(twin).isEmpty && twin.exceptAll(q).isEmpty)
  }

  test("q19: Catalyst pushes the single-table residual disjunctions to each scan") {
    val plan = Relational.q19Disjunctive(spark, Sf).queryExecution.executedPlan.toString
    // lineitem scan: Or(...l_quantity...); part scan: Or(...p_brand/p_size...)
    for (c <- Seq("l_quantity", "p_brand"))
      assert(raw"PushedFilters: \[[^\]]*Or\([^\]]*$c".r.findFirstIn(plan).nonEmpty ||
        raw"PushedFilters: \[[^\]]*$c[^\]]*Or\(".r.findFirstIn(plan).nonEmpty,
        s"derived $c disjunction must push to its scan\n$plan")
  }

  test("q21 equals the per-quantifier raw-fact formulation it collapses") {
    val li = Tables.lineitem(spark, Sf)
    val l1 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("orderkey"), col("l_suppkey").as("suppkey"))
      .distinct()
    // quantifiers straight against RAW lineitem rows (the textbook plan the
    // collapsed participation frame replaces)
    val naive = l1
      .join(li, col("l_orderkey") === col("orderkey") &&
        col("l_suppkey") =!= col("suppkey"), "left_semi")
      .join(li.filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("orderkey") &&
          col("l_suppkey") =!= col("suppkey"), "left_anti")
      .join(Tables.supplier(spark, Sf), col("suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
    val q = Relational.q21Waiting(spark, Sf)
    assert(q.exceptAll(naive).isEmpty && naive.exceptAll(q).isEmpty)
  }

  test("q2MinCost equals the correlated-min formulation; region restriction holds") {
    val q = Relational.q2MinCost(spark, Sf01)
    val rows = q.collect()
    assert(rows.nonEmpty, "size/type cut should leave parts at sf0.01")
    // Naive twin: supply pairs filtered to region suppliers, per-part min by
    // a plain self-join (the textbook correlated subquery, undecorrelated).
    val supply = Tables.lineitem(spark, Sf01)
      .join(Tables.part(spark, Sf01).filter(col("p_size") === 15 && col("p_type") === "SMALL"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("l_suppkey"))
      .agg(min(floor(col("l_extendedprice") * lit(10000.0) / col("l_quantity"))
        .cast("long")).as("cost_fp"))
      .join(Tables.supplier(spark, Sf01), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, Sf01), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, Sf01), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
    val mins = supply.groupBy(col("p_partkey").as("pk")).agg(min(col("cost_fp")).as("mc"))
    val naive = supply.join(mins, col("p_partkey") === col("pk") && col("cost_fp") === col("mc"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("cost_fp"))
    assert(q.exceptAll(naive).isEmpty && naive.exceptAll(q).isEmpty)
  }

  test("q9Profit groups cover exactly the filtered fact's (nation, year) pairs") {
    val q = Relational.q9Profit(spark, Sf01)
    val expected = Tables.lineitem(spark, Sf01)
      .join(Tables.part(spark, Sf01).filter(col("p_name").contains("widget")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, Sf01), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, Sf01), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), year(col("l_shipdate")).cast("long").as("y"))
      .distinct().count()
    assert(q.count() === expected)
    // Profit must be strictly less than gross revenue for every group (the
    // 0.8·retailprice cost is positive on every contributing line).
    val gross = Tables.lineitem(spark, Sf01)
      .join(Tables.part(spark, Sf01).filter(col("p_name").contains("widget")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, Sf01), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, Sf01), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation2"), year(col("l_shipdate")).cast("long").as("y"))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val bad = q.join(gross, col("nation") === col("nation2") && col("o_year") === col("y"))
      .filter(col("sum_profit") >= col("rev")).count()
    assert(bad === 0L)
  }

  test("q11ImportantPart: exact threshold semantics on both sides of the boundary") {
    val q = Relational.q11ImportantPart(spark, Sf01)
    val all = Tables.lineitem(spark, Sf01)
      .join(Tables.supplier(spark, Sf01), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, Sf01).filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(org.apache.spark.sql.types.DecimalType(24, 6))).as("v"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val total = all.values.map(BigDecimal(_)).sum
    val expectKeys = all.collect { case (k, v) if BigDecimal(v) * 500 > total => k }.toSet
    val gotKeys = q.collect().map(_.getLong(0)).toSet
    assert(gotKeys === expectKeys)
    assert(gotKeys.nonEmpty && gotKeys.size < all.size, "threshold must actually select")
  }

  test("q20PotentialPromo: at most one dominant supplier per part; counts match naive") {
    val q = Relational.q20PotentialPromo(spark, Sf01)
    val shipped = Tables.lineitem(spark, Sf01)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .join(Tables.part(spark, Sf01).filter(col("p_name").startsWith("small ")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    val totals = shipped.groupBy(col("l_partkey").as("pk")).agg(sum(col("qty")).as("total"))
    val dominant = shipped.join(totals, col("l_partkey") === col("pk"))
      .filter(col("qty") > lit(0.5) * col("total"))
    // >1/2 admits at most one winner per part
    val multi = dominant.groupBy(col("l_partkey")).count().filter(col("count") > 1).count()
    assert(multi === 0L)
    val naive = dominant
      .join(Tables.supplier(spark, Sf01), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name")).agg(count(lit(1)).as("n_dominated"))
    assert(q.exceptAll(naive).isEmpty && naive.exceptAll(q).isEmpty)
  }
}
