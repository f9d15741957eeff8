package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (starting a SparkContext per
  * suite costs ~10 s each). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // tmpfs shuffle dirs: host disk is intermittently throttled and was
      // measured turning 3 s shuffles into minutes (DiskBlockObjectWriter-bound)
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
