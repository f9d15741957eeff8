package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (starting a SparkContext per
  * suite costs ~10 s each). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // local[4, 2] = 4 threads, maxFailures 2: tasks get ONE retry, so the
      // fault-tolerance spec (F13) can inject a first-attempt failure and
      // observe reassignment — the same knob a cluster sets via
      // spark.task.maxFailures. Passing tests never retry, so this changes
      // nothing for the rest of the suite.
      .master("local[4, 2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the cluster-config wiring for the custom SQL functions (static conf,
      // must be set when the SparkContext is created); GraftExtensionsSpec
      // verifies the injection on fresh sessions
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // tmpfs-by-default shuffle dirs (GRAFT_LOCAL_DIR overrides; see LocalDirs)
      .config("spark.local.dir", LocalDirs.sparkLocalDir)
      // saveAsTable targets (BucketingSpec) go to scratch, not the repo
      .config("spark.sql.warehouse.dir", s"${LocalDirs.scratchRoot}/graft-warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
