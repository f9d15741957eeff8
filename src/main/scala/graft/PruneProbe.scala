package graft
import org.apache.spark.sql.SparkSession
object PruneProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.local.dir", LocalDirs.sparkLocalDir)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/tmp/sf1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    // `--all` enumerates the WHOLE registry and prints each query's
    // full/count ratio (min over 2 reps each): the set with ratio > ~1.5
    // is exactly the set whose count()-era ladder points timed
    // optimizer-hollowed plans and need full-row re-laddering.
    val names =
      if (args.drop(1).headOption.contains("--all")) SparkEntry.queries.keys.toSeq.sorted
      else args.drop(1).toSeq
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      // warm
      fn(spark, warmDir).count()
      fn(spark, warmDir).queryExecution.toRdd.count()
      def minOf(run: () => Unit): Double =
        (1 to 2).map { _ =>
          val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
        }.min
      try {
        val tCount = minOf(() => { fn(spark, sf).count(): Unit })
        val tFull = minOf(() => { fn(spark, sf).queryExecution.toRdd.count(): Unit })
        println(f"[probe] $name count=$tCount%.3f full=$tFull%.3f ratio=${tFull / math.max(tCount, 1e-9)}%.2f")
      } catch { case e: Throwable => println(s"[probe] $name FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
