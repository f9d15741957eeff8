package graft.mr

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** F13 verified, not asserted: the Spark analog of the reference's
  * dead-worker reassignment tests
  * (`/root/reference/tests/test_manager_05.py:271-288` — kill a worker
  * mid-map, the task is reassigned, output is unchanged). Here the failure
  * is a first-attempt exception inside a map task; the test session runs
  * `local[4, 2]` (`spark.task.maxFailures` semantics: tasks get one
  * retry), so the DAGScheduler must resubmit the attempt and the job must
  * produce byte-identical output to an undisturbed run. */
class FaultToleranceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val RefInput = "/root/reference/tests/testdata/input"
  private val WcGolden = "/root/reference/tests/testdata/correct/word_count_correct.txt"
  private def haveFixtures = Files.isDirectory(Paths.get(RefInput))

  private def readLines(p: Path): List[String] =
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .split("\n", -1).toList.dropRight(1)

  test("a failed first task attempt is reassigned and output matches the golden byte-exactly") {
    assume(haveFixtures)
    FaultToleranceSpec.drills.set(0)
    // Same stream semantics as wc_map.sh, but the first attempt of map
    // partition 0 dies before emitting anything. (A user accumulator would
    // not see failed-attempt updates — countFailedValues=false — so the
    // injection counter is a static; the test session is single-JVM.)
    val failingMapper = Native { lines =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
        FaultToleranceSpec.drills.incrementAndGet()
        throw new RuntimeException("F13 drill: injected first-attempt map failure")
      }
      NativeQueries.wcMapSh(lines)
    }
    val out = Files.createTempDirectory("graft-f13-")
    out.toFile.deleteOnExit()
    MrJob.run(spark, JobSpec(RefInput, out.toString,
      failingMapper, Native(NativeQueries.wcReduceSh),
      numMappers = 4, numReducers = 1))
    assert(FaultToleranceSpec.drills.get() === 1,
      "the injected failure must have fired exactly once (attempt 0), then been retried")
    // Identical to the undisturbed golden: the retry re-ran the SAME file
    // split (deterministic F2 assignment), not a different one.
    assert(readLines(out.resolve("part-00000")) === readLines(Paths.get(WcGolden)))
  }
}

object FaultToleranceSpec {
  val drills = new AtomicInteger(0)
}
