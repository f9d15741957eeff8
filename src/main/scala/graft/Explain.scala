package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan and timing for one query.
  * Usage: runMain graft.Explain <queryName> [sfDir] [reps]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // tmpfs-by-default shuffle dirs (GRAFT_LOCAL_DIR overrides; see LocalDirs)
      .config("spark.local.dir", LocalDirs.sparkLocalDir)
      .config("spark.sql.adaptive.enabled", "true")
    // Extra configs: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).explain("formatted")
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      // full-row materialization — same estimator as Bench (count-star
      // would prune the aggregate expressions out of card-shaped plans)
      val n = fn(spark, sfDir).queryExecution.toRdd.count()
      println(f"[explain] $name rep$r: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
