package graft.mr

import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Job-level API: FIFO submission with sequential job ids, mirroring the
  * reference Manager's queue semantics (SURVEY.md §2.1 F9/F10).
  *
  * The division of labor is deliberate: this class owns WHAT the reference's
  * control plane decided (admission order, output-directory creation, job
  * ids); Spark owns HOW it executed (task scheduling = DAGScheduler, stage
  * barrier = shuffle dependency, retries = spark.task.maxFailures, worker
  * membership/heartbeats = executor lifecycle, graceful shutdown =
  * spark.stop()). Reimplementing those on top of Spark would only duplicate
  * weaker versions of machinery Spark already runs at 1000-executor scale.
  */
class MapReduceEngine(spark: SparkSession) {
  private val nextJobId = new AtomicInteger(0)

  /** Submit and synchronously run a job (the reference runs jobs strictly
    * FIFO — one at a time off its queue). Returns (jobId, part files). */
  def submit(job: JobSpec): (Int, Seq[String]) = synchronized {
    val id = nextJobId.getAndIncrement()
    val out = new Path(job.outputDir)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Manager creates the user's output directory on admission
    // (/root/reference/tests/test_manager_01.py:37-45).
    fs.mkdirs(out)
    (id, MrJob.run(spark, job))
  }

  def shutdown(): Unit = spark.stop()
}
