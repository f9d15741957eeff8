package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: repeated-pass timing of the curation composite (and any other
  * query named in args) to separate structural cost from checkpoint-block
  * accumulation and host noise. */
object ProbeMix {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq else Seq("training_mix_full")
    val passes = if (args.length > 2) args(2).toInt else 4
    val unpersist = sys.env.get("PROBE_UNPERSIST").contains("1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.local.dir", LocalDirs.sparkLocalDir)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; p <- 1 to passes) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val rdds = spark.sparkContext.getPersistentRDDs.size
      println(f"[probe] $name pass $p: $n rows in $secs%.2fs (persistentRDDs=$rdds, unpersist=$unpersist)")
      if (unpersist)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
