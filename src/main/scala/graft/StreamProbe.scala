package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev probe: run named streaming queries once with a global
  * StreamingQueryListener attached and print every micro-batch's progress
  * JSON (durationMs breakdown: triggerExecution, addBatch, getBatch,
  * latestOffset, walCommit, commitOffsets, stateOperators) — locates where
  * the streaming demos' fixed per-run seconds actually go.
  * Usage: runMain graft.StreamProbe <q1>[,<q2>...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_STREAM_REPS.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val names = args.toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "usage: runMain graft.StreamProbe <query>[,...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.get("SPARK_GRAFT_STREAM_REPS").map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.local.dir", LocalDirs.sparkLocalDir)
      .config("spark.sql.adaptive.enabled", "true")
      // initialPartitionNum is DELIBERATELY omitted (unlike Bench/Verify/
      // Probe): streaming micro-batches plan without AQE partition
      // coalescing, and the demos override shuffle.partitions per run
      // (StreamingOps.withStateParts), so the knob would be dead config
      // here — documented per round-13 ADVICE.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[stream] started ${e.name} at ${System.nanoTime() / 1000000}ms")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        println(s"[stream] progress ${e.progress.name} batch=${e.progress.batchId} " +
          s"rows=${e.progress.numInputRows} durationMs=${e.progress.durationMs} " +
          s"stateOps=${Option(e.progress.stateOperators).map(_.toSeq.map(s =>
            s"commit=${s.commitTimeMs}ms mem=${s.memoryUsedBytes}")).getOrElse(Seq())}")
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[stream] terminated at ${System.nanoTime() / 1000000}ms")
    })
    names.foreach { name =>
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count(): Unit
        catch { case e: Throwable => System.err.println(s"[streamprobe] $name: ${e.getMessage}") }
        println(f"[streamprobe] $name rep$r total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
