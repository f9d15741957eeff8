package graft.mr

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** End-to-end jobs against the reference's own fixtures and goldens
  * (read-only under /root/reference; outputs go to temp dirs).
  * Mirrors tests/test_integration_00..02 semantics. */
class MrJobSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val RefInput = "/root/reference/tests/testdata/input"
  private val RefExec = "/root/reference/tests/testdata/exec"
  private val WcGolden = "/root/reference/tests/testdata/correct/word_count_correct.txt"
  private val GrepGolden = "/root/reference/tests/testdata/correct/grep_correct.txt"

  private def haveFixtures = Files.isDirectory(Paths.get(RefInput))

  private def tmpOut(tag: String): Path = {
    val d = Files.createTempDirectory(s"graft-mr-$tag-")
    d.toFile.deleteOnExit()
    d
  }

  private def readLines(p: Path): List[String] =
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .split("\n", -1).toList.dropRight(1) // files end with trailing newline

  test("native word count matches word_count_correct.txt (merged, like test_integration_01)") {
    assume(haveFixtures)
    val out = tmpOut("wc-native")
    val engine = new MapReduceEngine(spark)
    val (_, parts) = engine.submit(JobSpec(RefInput, out.toString,
      Native(NativeQueries.wcMapSh), Native(NativeQueries.wcReduceSh),
      numMappers = 2, numReducers = 2))
    assert(parts.size === 2)
    val got = parts.flatMap(p => readLines(Paths.get(p))).sorted(CByteOrdering)
    val want = readLines(Paths.get(WcGolden)).sorted(CByteOrdering)
    assert(got === want)
  }

  test("native word count with R=1 reproduces the golden byte order exactly") {
    assume(haveFixtures)
    val out = tmpOut("wc-r1")
    MrJob.run(spark, JobSpec(RefInput, out.toString,
      Native(NativeQueries.wcMapSh), Native(NativeQueries.wcReduceSh),
      numMappers = 4, numReducers = 1))
    val got = readLines(out.resolve("part-00000"))
    val want = readLines(Paths.get(WcGolden))
    assert(got === want) // C-sorted stream in, grouped stream out — no resort
  }

  test("exec word count (reference wc_map.sh/wc_reduce.sh) matches golden") {
    assume(haveFixtures)
    val out = tmpOut("wc-exec")
    MrJob.run(spark, JobSpec(RefInput, out.toString,
      Exec(Seq(s"$RefExec/wc_map.sh")), Exec(Seq(s"$RefExec/wc_reduce.sh")),
      numMappers = 2, numReducers = 2))
    val got = (0 until 2).flatMap(i => readLines(out.resolve(f"part-$i%05d")))
      .sorted(CByteOrdering).toList
    val want = readLines(Paths.get(WcGolden)).sorted(CByteOrdering)
    assert(got === want)
  }

  test("exec .py word count (reference wc_map.py/wc_reduce.py) == native py twins byte-exactly") {
    // The .py pair differs from the .sh pair: whitespace str.split() with
    // no empties, NO lowercasing, and SPACE-separated reduce output
    // (wc_reduce.py:16 f-string). Different mapper counts on purpose — the
    // output must be invariant to the map-task split.
    assume(haveFixtures)
    val outExec = tmpOut("wcpy-exec")
    val outNat = tmpOut("wcpy-native")
    MrJob.run(spark, JobSpec(RefInput, outExec.toString,
      Exec(Seq(s"$RefExec/wc_map.py")), Exec(Seq(s"$RefExec/wc_reduce.py")),
      numMappers = 2, numReducers = 2))
    MrJob.run(spark, JobSpec(RefInput, outNat.toString,
      Native(NativeQueries.wcMapPy), Native(NativeQueries.wcReducePy),
      numMappers = 3, numReducers = 2))
    for (i <- 0 until 2) {
      val got = readLines(outExec.resolve(f"part-$i%05d"))
      assert(got.nonEmpty)
      assert(got === readLines(outNat.resolve(f"part-$i%05d")))
      // Space-separated "<key> <count>" reduce output, per the .py contract.
      assert(got.forall(l => l.matches(".* \\d+") && !l.contains("\t")))
    }
  }

  test("vendored wc scripts reproduce word_count_correct.txt (no reference binaries)") {
    // The resource-extracted pipeline (what mr_wordcount_exec uses when the
    // reference checkout is absent) must hit the same golden as the
    // reference's own wc_map.sh/wc_reduce.sh.
    assume(haveFixtures)
    val res = Seq("wc_map.sh", "wc_reduce.sh").map { n =>
      val dir = Files.createTempDirectory("graft-vendored-")
      dir.toFile.deleteOnExit()
      val p = dir.resolve(n)
      val in = getClass.getResourceAsStream(s"/graft/exec/$n")
      assert(in != null, s"vendored resource $n missing")
      try Files.copy(in, p) finally in.close()
      p.toFile.setExecutable(true)
      p.toString
    }
    val out = tmpOut("wc-vendored")
    MrJob.run(spark, JobSpec(RefInput, out.toString,
      Exec(Seq(res(0))), Exec(Seq(res(1))), numMappers = 2, numReducers = 1))
    assert(readLines(out.resolve("part-00000")) === readLines(Paths.get(WcGolden)))
  }

  test("exec grep matches grep_correct.txt byte-exactly (test_integration_00: M=2, R=1)") {
    assume(haveFixtures)
    val out = tmpOut("grep-exec")
    MrJob.run(spark, JobSpec(RefInput, out.toString,
      Exec(Seq(s"$RefExec/grep_map.py")), Exec(Seq(s"$RefExec/grep_reduce.py")),
      numMappers = 2, numReducers = 1))
    assert(readLines(out.resolve("part-00000")) === readLines(Paths.get(GrepGolden)))
  }

  test("exec grep with a NON-DEFAULT argv query term (grep_map.py sys.argv) matches the native twin") {
    // The reference's grep_map.py reads its query from sys.argv (falling
    // back to "product"); Exec(Seq(script, arg)) must deliver the argument
    // to the forked process. Differential golden: the native grepMap twin
    // is already proven byte-exact against the reference's grep fixtures,
    // so exec-with-argv must reproduce it for a term the default would
    // never match.
    assume(haveFixtures)
    val term = "money"
    val outExec = tmpOut("grep-exec-argv")
    MrJob.run(spark, JobSpec(RefInput, outExec.toString,
      Exec(Seq(s"$RefExec/grep_map.py", term)), Exec(Seq(s"$RefExec/grep_reduce.py")),
      numMappers = 2, numReducers = 1))
    val outNative = tmpOut("grep-native-argv")
    MrJob.run(spark, JobSpec(RefInput, outNative.toString,
      Native(NativeQueries.grepMap(term)), Native(NativeQueries.grepReduce),
      numMappers = 2, numReducers = 1))
    val got = readLines(outExec.resolve("part-00000"))
    assert(got === readLines(outNative.resolve("part-00000")))
    assert(got.nonEmpty, s"term '$term' must match some input lines or the golden is vacuous")
    assert(got !== readLines(Paths.get(GrepGolden)),
      "argv term must change the output vs the default 'product' query")
  }

  test("native grep matches grep golden too") {
    assume(haveFixtures)
    val out = tmpOut("grep-native")
    MrJob.run(spark, JobSpec(RefInput, out.toString,
      Native(NativeQueries.grepMap("product")), Native(NativeQueries.grepReduce),
      numMappers = 2, numReducers = 1))
    assert(readLines(out.resolve("part-00000")) === readLines(Paths.get(GrepGolden)))
  }

  test("map routing matches test_worker_08 partition goldens (R=2)") {
    // Partition+sort the mapper output of the reference input and check the
    // per-partition key sets against the md5 routing contract.
    assume(haveFixtures)
    val sc = spark.sparkContext
    val lines = MrJob.listInputFiles(spark, RefInput)
      .map(f => sc.textFile(f, 1)).reduce(sc.union(_, _))
    val mapped = lines.mapPartitions(NativeQueries.wcMapSh)
    implicit val ord: Ordering[String] = CByteOrdering
    val parts = mapped.map(l => (l, null))
      .repartitionAndSortWithinPartitions(new Md5LinePartitioner(2))
      .keys
      .mapPartitionsWithIndex { case (pid, it) => it.map(l => (pid, Md5Partitioning.keyOf(l))) }
      .distinct().collect().toSet
    for (k <- Seq("", "bye", "hello") if parts.exists(_._2 == k))
      assert(parts.contains((0, k)) && !parts.contains((1, k)))
    for (k <- Seq("world", "goodbye", "hadoop") if parts.exists(_._2 == k))
      assert(parts.contains((1, k)) && !parts.contains((0, k)))
  }

  test("randomized corpus: MR pipeline counts == native groupBy counts") {
    // Differential check with a seeded random corpus (deterministic):
    // union of all part files must agree with a straight DataFrame count.
    val rnd = new scala.util.Random(42)
    // Brackets included deliberately: tr '[ \t]' treats them as literal
    // split characters, so "[tag]" must count as ""/"tag"/"" segments.
    val words = Vector("alpha", "beta", "gamma", "", "DELTA", "épsilon", "[tag]", "mix[ed", "a]b")
    val lines = Seq.fill(200)(Seq.fill(rnd.nextInt(8))(words(rnd.nextInt(words.size))).mkString(" "))
    val in = Files.createTempDirectory("graft-mr-rand-in-")
    lines.grouped(50).zipWithIndex.foreach { case (chunk, i) =>
      Files.write(in.resolve(f"file$i%02d"), chunk.mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    val out = tmpOut("rand")
    MrJob.run(spark, JobSpec(in.toString, out.toString,
      Native(NativeQueries.wcMapSh), Native(NativeQueries.wcReduceSh),
      numMappers = 3, numReducers = 4))
    val got = (0 until 4).flatMap(i => readLines(out.resolve(f"part-$i%05d")))
      .map { l => val i = l.lastIndexOf('\t'); l.substring(0, i) -> l.substring(i + 1).toLong }
      .toMap
    val expect = lines.flatMap(_.split("[\\[\\] \t]", -1)).map(_.toLowerCase)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got === expect)
  }

  test("bracket corpus: reference wc_map.sh/wc_reduce.sh == native twins byte-exactly") {
    // The reference fixtures contain no '['/']', so the goldens cannot
    // distinguish "split on space/tab" from tr's real "split on
    // [, ], space, tab". This differential runs the reference's OWN
    // executables on a bracket-heavy corpus and byte-compares against the
    // native twins — ground truth for the ADVICE bracket fix.
    assume(haveFixtures)
    val lines = Seq("alpha [tag] beta", "x[y]z", "[[]]", "plain words here",
      "mix[ed bra]ckets [and] SHOUT[ING]", "")
    val in = Files.createTempDirectory("graft-mr-bracket-in-")
    Files.write(in.resolve("file00"), lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    val outExec = tmpOut("bracket-exec")
    val outNat = tmpOut("bracket-native")
    MrJob.run(spark, JobSpec(in.toString, outExec.toString,
      Exec(Seq(s"$RefExec/wc_map.sh")), Exec(Seq(s"$RefExec/wc_reduce.sh")),
      numMappers = 1, numReducers = 2))
    MrJob.run(spark, JobSpec(in.toString, outNat.toString,
      Native(NativeQueries.wcMapSh), Native(NativeQueries.wcReduceSh),
      numMappers = 1, numReducers = 2))
    for (i <- 0 until 2)
      assert(readLines(outExec.resolve(f"part-$i%05d")) === readLines(outNat.resolve(f"part-$i%05d")))
    // Sanity: the brackets really did split ("tag" counted, "[tag]" never emitted).
    val all = (0 until 2).flatMap(i => readLines(outNat.resolve(f"part-$i%05d")))
    assert(all.contains("tag\t1") && !all.exists(_.startsWith("[tag]")))
  }

  test("byte-split native mode (F2 large-file path) reproduces the golden byte-exactly") {
    // splitFilesByBytes lets Hadoop TextInputFormat cut files into byte
    // ranges (the 10 GB-file shape) instead of one-partition-per-file;
    // line-local mappers must produce identical output. Verified against
    // the R=1 golden, and the map stage must actually have >1 partition.
    assume(haveFixtures)
    val out = tmpOut("wc-split")
    MrJob.run(spark, JobSpec(RefInput, out.toString,
      Native(NativeQueries.wcMapSh), Native(NativeQueries.wcReduceSh),
      numMappers = 8, numReducers = 1, splitFilesByBytes = true))
    assert(readLines(out.resolve("part-00000")) === readLines(Paths.get(WcGolden)))
    val nSplits = spark.sparkContext
      .textFile(MrJob.listInputFiles(spark, RefInput).mkString(","), 8)
      .getNumPartitions
    assert(nSplits > 1)
  }

  test("Md5LinePartitioner is not equal to Md5Partitioner (different routing)") {
    // If these compared equal, Spark would treat RDDs partitioned by each
    // as co-partitioned and skip the shuffle on a cogroup — wrong results.
    assert(new Md5Partitioner(4) != new Md5LinePartitioner(4))
    assert(new Md5LinePartitioner(4) != new Md5Partitioner(4))
    assert(new Md5Partitioner(4) == new Md5Partitioner(4))
    assert(new Md5LinePartitioner(4) == new Md5LinePartitioner(4))
    assert(new Md5Partitioner(4) != new Md5Partitioner(8))
  }

  test("FIFO engine assigns sequential job ids") {
    assume(haveFixtures)
    val engine = new MapReduceEngine(spark)
    val (id0, _) = engine.submit(JobSpec(RefInput, tmpOut("fifo0").toString,
      Native(NativeQueries.grepMap("product")), Native(NativeQueries.grepReduce), 1, 1))
    val (id1, _) = engine.submit(JobSpec(RefInput, tmpOut("fifo1").toString,
      Native(NativeQueries.grepMap("product")), Native(NativeQueries.grepReduce), 1, 1))
    assert(id0 === 0 && id1 === 1)
  }
}
