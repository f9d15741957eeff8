package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: per query, split wall time into DRIVER PLANNING (construct
  * the DataFrame + force analysis/optimization/physical planning) vs
  * EXECUTION (toRdd.count on the already-planned frame), to find queries
  * whose bench cost is dominated by plan size rather than data work.
  * Each pass re-plans from scratch exactly like Bench's onePass does.
  * Usage: runMain graft.PlanTime [<q1>,<q2>,...|ALL]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_PLANTIME_PASSES.
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val names0 = args.toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val names =
      if (names0.isEmpty || names0 == Seq("ALL")) SparkEntry.queries.keys.toSeq.sorted
      else names0
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.get("SPARK_GRAFT_PLANTIME_PASSES").map(_.toInt).getOrElse(2)
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.local.dir", LocalDirs.sparkLocalDir)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        BenchCore.initialPartitions(sfDir, cpus.toInt))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT warmup on the tiny corpus (same as Bench).
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      names.foreach { n =>
        try SparkEntry.queries(n)(spark, warmDir).queryExecution.toRdd.count(): Unit
        catch { case e: Throwable => System.err.println(s"[plantime] warmup $n: ${e.getMessage}") }
      }
    }
    if (sys.env.getOrElse("SPARK_GRAFT_DATA_WARM", "1") != "0")
      BenchCore.warmData(new java.io.File(sfDir), _ => ()): Unit
    // Same heap-pressure hygiene as Bench.onePass: without it, queries
    // late in the sweep inherit un-reclaimed checkpoint blocks and their
    // construction-time jobs crawl under GC pressure (the round-12
    // "ordering pressure" confound — first sweep of this probe measured
    // ivf_balance at 14 s vs its 0.6 s bench median for exactly this
    // reason).
    def gcIfPressured(): Unit = {
      val rt = Runtime.getRuntime
      if (rt.totalMemory - rt.freeMemory > rt.maxMemory / 2) System.gc()
    }
    println("query,pass,construct_sec,plan_sec,exec_sec,total_sec")
    names.foreach { name =>
      if (name.startsWith("events_stream") || name == "docs_stream_dedup") {
        // streaming: fn() runs the stream; planning split is meaningless.
        (1 to passes).foreach { p =>
          gcIfPressured()
          val t0 = System.nanoTime()
          try SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count(): Unit
          catch { case e: Throwable => System.err.println(s"[plantime] $name: ${e.getMessage}") }
          val t = (System.nanoTime() - t0) / 1e9
          println(f"$name,$p,NaN,NaN,NaN,$t%.3f")
        }
      } else (1 to passes).foreach { p =>
        try {
          gcIfPressured()
          val t0 = System.nanoTime()
          // construction: includes any eager actions the operator runs
          // while BUILDING the frame (k-means/BPE driver loops, eager
          // checkpoints) — driver-sequenced work no final-plan change sees
          val df = SparkEntry.queries(name)(spark, sfDir)
          val t1 = System.nanoTime()
          val qe = df.queryExecution
          qe.executedPlan // force analysis + optimization + physical planning
          val t2 = System.nanoTime()
          qe.toRdd.count(): Unit
          val t3 = System.nanoTime()
          println(f"$name,$p,${(t1 - t0) / 1e9}%.3f,${(t2 - t1) / 1e9}%.3f," +
            f"${(t3 - t2) / 1e9}%.3f,${(t3 - t0) / 1e9}%.3f")
        } catch { case e: Throwable =>
          System.err.println(s"[plantime] $name FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
