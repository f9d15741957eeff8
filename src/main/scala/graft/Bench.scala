package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":"total","value":…,"queries":{…}}.
  *
  * A warmup pass runs each query once at sf0.001 (untimed): local-mode cold
  * JVMs otherwise charge whole-stage-codegen compilation and C2 JIT of the
  * parquet/shuffle/agg machinery to whichever query happens to run first
  * (measured: 20–120 s of first-run skew at sf0.1, on plans whose warm cost
  * is 1–5 s). On a long-lived cluster those costs are paid once per
  * executor lifetime, not per query — warmup reproduces that steady state.
  *
  * NOISE SELF-DEFENSE (this host has noisy neighbors; identical full-bench
  * runs have measured 22 s to 265 s, and round 4's driver capture was ~35%
  * inflated vs a clean re-run of the same commit):
  *   - a fixed CALIBRATION workload — a pinned in-memory generate→hash-agg→
  *     sort over `spark.range`, no IO, no data dependence — is timed at
  *     bench start, middle, and end; `noise_index` = max/min of those three
  *     timings. On a quiet host the same workload repeats within a few
  *     percent (index ≈ 1.0); external throttling during the window shows
  *     up as index ≫ 1 with the per-pass timings saying WHEN. Readers can
  *     therefore tell "the code got slower" from "the host got slower"
  *     without re-running.
  *   - ADAPTIVE re-measurement: every query gets 3 passes; if the good-pass
  *     spread exceeds 50% of the median (one pass hit a throttled window),
  *     up to 2 extra passes run and the median is taken over all of them —
  *     5 samples reject up to two corrupted ones. Per-query pass counts are
  *     recorded so an artifact reader can see which timings needed rescue.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // tmpfs-by-default shuffle dirs (GRAFT_LOCAL_DIR overrides): host disk
      // is intermittently throttled and was measured turning 3 s shuffles
      // into minutes (DiskBlockObjectWriter-bound)
      .config("spark.local.dir", LocalDirs.sparkLocalDir)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Fixed calibration workload: generate → modular hash-agg → sort, all
    // in-memory and data-independent, sized to exercise codegen + exchange
    // machinery for a few hundred ms warm. Its only legitimate run-to-run
    // variation is the host.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 8L * 1000 * 1000, 1L, numPartitions = 32)
        .selectExpr("id % 9973 AS k", "(id * 2654435761) % 1000003 AS v")
        .groupBy("k").agg(
          org.apache.spark.sql.functions.sum("v"),
          org.apache.spark.sql.functions.avg("v"))
        .orderBy("k").count(): Unit
      (System.nanoTime() - t0) / 1e9
    }

    // Dev-only subset filter (comma-separated names): scaling audits time
    // the heaviest queries on a larger synthetic corpus without paying the
    // full 118-query pass. The driver's per-round bench never sets this.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
        .foreach { case (name, fn) =>
          try fn(spark, warmDir).count(): Unit
          catch { case e: Throwable => System.err.println(s"[bench] warmup $name: ${e.getMessage}") }
        }
    }
    calibrate() // untimed: JIT/codegen warm for the calibration plan itself

    // Median of 3 passes per query (5 when the spread says a pass was
    // corrupted — see the object doc): the median rejects a throttled
    // outlier in either direction, where best-of-N could hide a real
    // regression behind one lucky pass and a single sample can be 10× off.
    // Failures are recorded per query — a failed pass contributes no timing
    // and the name lands in "failed", so a fast crash can't make the total
    // look better.
    case class Q(name: String, median: Double, spreadPct: Double, passes: Int, ok: Boolean)
    def onePass(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(): Unit; true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    def stats(samples: Seq[Double]): (Double, Double) = {
      val s = samples.sorted
      // True median: average the two middle samples when the good-pass
      // count is even (a failed pass leaves an even count; upper-middle
      // alone would report toward the max).
      val med =
        if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
      val spread = if (med > 0) (s.max - s.min) / med * 100 else 0.0
      (med, spread)
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val calStart = calibrate()
    val midpoint = ordered.size / 2
    var calMiddle = calStart // overwritten at the midpoint query
    val results = ordered.zipWithIndex.map { case ((name, fn), i) =>
      if (i == midpoint) calMiddle = calibrate()
      var passes = (1 to 3).map(_ => onePass(name, fn))
      var good = passes.filter(_._2).map(_._1)
      // Adaptive rescue: spread > 50% means at least one pass hit a
      // throttled window — buy 2 more samples so the median sits on
      // majority-clean data. (Never triggered on a quiet host, so the
      // steady-state bench cost stays 3 passes/query.)
      while (good.nonEmpty && passes.size < 5 && stats(good)._2 > 50.0) {
        passes = passes :+ onePass(name, fn)
        good = passes.filter(_._2).map(_._1)
      }
      if (good.isEmpty) Q(name, 0.0, 0.0, passes.size, ok = false)
      else {
        val (med, spread) = stats(good)
        Q(name, med, spread, passes.size, ok = passes.forall(_._2))
      }
    }
    val calEnd = calibrate()
    val cals = Seq(calStart, calMiddle, calEnd)
    val noiseIndex = cals.max / math.max(cals.min, 1e-9)

    def fmt(d: Double) = f"$d%.4f"
    val qs = results.map(r => "\"" + r.name + "\":" + fmt(r.median)).mkString("{", ",", "}")
    val spreads = results.map(r => "\"" + r.name + "\":" + f"${r.spreadPct}%.1f").mkString("{", ",", "}")
    val passCounts = results.map(r => "\"" + r.name + "\":" + r.passes).mkString("{", ",", "}")
    val failed = results.filterNot(_.ok).map("\"" + _.name + "\"").mkString("[", ",", "]")
    val total = results.map(_.median).sum
    val calJson = cals.map(fmt).mkString("[", ",", "]")
    // Stdout carries ONE SHORT machine-readable JSON line: the driver
    // tail-captures ~2.2 KB of stdout, and a 100+-query map (~2.9 KB)
    // overflowed it for three straight rounds (BENCH_r01..r03 all
    // `parsed: null`). Totals/failed/counts/noise stay on stdout; the full
    // per-query median+spread+passes map is written to a repo artifact
    // (path overridable via SPARK_GRAFT_BENCH_DETAILS) and mirrored to
    // stderr.
    val detailsPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAILS", "bench_details.json")
    val detailsJson =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","passes":3,"estimator":"median","n":${results.size},"noise_index":${f"$noiseIndex%.2f"},"calibration_sec":$calJson,"failed":$failed,"queries":$qs,"spread_pct":$spreads,"pass_count":$passCounts}"""
    try {
      val w = new java.io.PrintWriter(detailsPath, "UTF-8")
      try w.println(detailsJson) finally w.close()
    } catch { case e: Throwable => System.err.println(s"[bench] details write failed: ${e.getMessage}") }
    System.err.println(s"[bench] details=$detailsJson")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"failed":$failed,"sf":"$sfDir","passes":3,"estimator":"median","noise_index":${f"$noiseIndex%.2f"},"details":"$detailsPath"}""")
    spark.stop()
  }
}
