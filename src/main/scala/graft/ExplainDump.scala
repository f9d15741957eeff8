package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` for the named queries to
  * `<outDir>/<query>_<suffix>.txt` — one JVM for the whole batch (a
  * per-query `runMain graft.Explain` pays ~40 s of sbt+JVM startup each).
  * Usage: runMain graft.ExplainDump <outDir> <suffix> <q1>[,<q2>...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  *
  * Streaming queries (events_stream_*, docs_stream_dedup) are skipped:
  * invoking them RUNS the stream and the returned memory-table frame's
  * plan says nothing about the streaming pipeline.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: runMain graft.ExplainDump <outDir> <suffix> <q1>[,...]")
    val outDir = new java.io.File(args(0))
    val suffix = args(1)
    val names0 = args.drop(2).flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).toSeq
    val names = if (names0 == Seq("ALL")) SparkEntry.queries.keys.toSeq.sorted else names0
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"not in the registry: ${unknown.mkString(", ")}")
    outDir.mkdirs()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    names.foreach { name =>
      if (name.startsWith("events_stream") || name == "docs_stream_dedup")
        System.err.println(s"[explaindump] $name: streaming query, skipped")
      else try {
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        val f = new java.io.File(outDir, s"${name}_$suffix.txt")
        val w = new java.io.PrintWriter(f, "UTF-8")
        try w.println(plan) finally w.close()
        System.err.println(s"[explaindump] wrote $f")
      } catch { case e: Throwable =>
        System.err.println(s"[explaindump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
