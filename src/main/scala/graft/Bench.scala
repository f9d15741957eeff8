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
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      SparkEntry.queries.foreach { case (name, fn) =>
        try fn(spark, warmDir).count()
        catch { case e: Throwable => System.err.println(s"[bench] warmup $name: ${e.getMessage}") }
      }
    }
    // Median of 3 passes per query: this host has noisy neighbors (identical
    // full-bench runs measured 22 s to 265 s); the median rejects a single
    // throttled outlier in either direction, where best-of-N could hide a
    // real regression behind one lucky pass and a single sample can be 10×
    // off. Failures are recorded per query — a failed pass contributes no
    // timing and the name lands in "failed", so a fast crash can't make the
    // total look better.
    case class Q(name: String, median: Double, spreadPct: Double, ok: Boolean)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val passes = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val good = passes.filter(_._2).map(_._1).sorted
      if (good.isEmpty) Q(name, 0.0, 0.0, ok = false)
      else {
        // True median: average the two middle samples when the good-pass
        // count is even (a failed pass leaves 2 samples; upper-middle
        // alone would report the max).
        val med =
          if (good.size % 2 == 1) good(good.size / 2)
          else (good(good.size / 2 - 1) + good(good.size / 2)) / 2.0
        val spread = if (med > 0) (good.max - good.min) / med * 100 else 0.0
        Q(name, med, spread, ok = passes.forall(_._2))
      }
    }
    def fmt(d: Double) = f"$d%.4f"
    val qs = results.map(r => "\"" + r.name + "\":" + fmt(r.median)).mkString("{", ",", "}")
    val spreads = results.map(r => "\"" + r.name + "\":" + f"${r.spreadPct}%.1f").mkString("{", ",", "}")
    val failed = results.filterNot(_.ok).map("\"" + _.name + "\"").mkString("[", ",", "]")
    val total = results.map(_.median).sum
    // Stdout carries ONE SHORT machine-readable JSON line: the driver
    // tail-captures ~2.2 KB of stdout, and a 100+-query map (~2.9 KB)
    // overflowed it for three straight rounds (BENCH_r01..r03 all
    // `parsed: null`). Totals/failed/counts stay on stdout; the full
    // per-query median+spread map is written to a repo artifact (path
    // overridable via SPARK_GRAFT_BENCH_DETAILS) and mirrored to stderr.
    val detailsPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAILS", "bench_details.json")
    val detailsJson =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","passes":3,"estimator":"median","n":${results.size},"failed":$failed,"queries":$qs,"spread_pct":$spreads}"""
    try {
      val w = new java.io.PrintWriter(detailsPath, "UTF-8")
      try w.println(detailsJson) finally w.close()
    } catch { case e: Throwable => System.err.println(s"[bench] details write failed: ${e.getMessage}") }
    System.err.println(s"[bench] details=$detailsJson")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"failed":$failed,"sf":"$sfDir","passes":3,"estimator":"median","details":"$detailsPath"}""")
    spark.stop()
  }
}
