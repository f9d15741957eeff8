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
    for (name <- args.drop(1)) {
      val fn = SparkEntry.queries(name)
      // warm
      fn(spark, "/root/testdata/sf0.001").count()
      fn(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count()
      for (r <- 1 to 2) {
        var t0 = System.nanoTime(); fn(spark, sf).count()
        val tCount = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); fn(spark, sf).queryExecution.toRdd.count()
        val tFull = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name rep$r count=$tCount%.3f full=$tFull%.3f")
      }
    }
    spark.stop()
  }
}
