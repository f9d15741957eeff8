package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("pii redaction: crafted emails and digit runs mask exactly") {
    val d = docs(
      1L -> "mail a.b@x.co.uk and call 12345678 or 123 end",
      2L -> "two mails x@y.io z@w.org, id 9999999",
      3L -> "clean text no pii at all")
    val out = Curation.piiRedactOfDocs(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(out(1L) === ((1L, 1L, md5hex("mail <EMAIL> and call <NUM> or 123 end"))))
    assert(out(2L) === ((2L, 1L, md5hex("two mails <EMAIL> <EMAIL>, id <NUM>"))))
    assert(out(3L) === ((0L, 0L, md5hex("clean text no pii at all"))))
  }

  test("repetition: hand-computed bigram fractions on a crafted corpus") {
    // doc 1: tokens a b a b a -> bigrams [ab, ba, ab, ba] -> top 2/4, dup (4-2)/4
    // doc 2: all distinct bigrams -> top 1/3, dup 0
    // doc 3: single token -> filtered out
    val d = docs(1L -> "a b a b a", 2L -> "w x y z", 3L -> "solo")
    val out = Curation.repetitionOfDocs(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((4L, 0.5, 0.5)))
    assert(out(2L) === ((3L, 0.333333, 0.0)))
  }

  test("winnow: identical docs share all fingerprints; fingerprints come from own shingles") {
    val d = docs(
      10L -> "the quick brown fox jumps over the lazy dog today",
      11L -> "the quick brown fox jumps over the lazy dog today", // exact copy
      12L -> "a completely different set of words goes right here")
    val fps = Curation.winnowOfDocs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fps(10L) === fps(11L))
    assert((fps(10L) & fps(12L)).isEmpty)
    // every fingerprint is the hash of one of the doc's own 3-gram shingles
    import org.apache.spark.sql.functions._
    val allHashes = d.select(col("doc_id"), explode(
        graft.functions.ShinglesExpression.word_shingles(TextOps.tokens(col("text")), 3)).as("s"))
      .select(col("doc_id"), conv(substring(md5(col("s")), 1, 14), 16, 10).cast("long").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((id, s) <- fps) assert(s.subsetOf(allHashes(id)), s"doc $id fingerprint not from own shingles")
  }

  test("winnow: native expression equals the interpreted lambda formulation at sf0.001") {
    import org.apache.spark.sql.functions._
    val lambda = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= Curation.WinnowK)
      .select(col("doc_id"),
        transform(graft.functions.ShinglesExpression.word_shingles(col("t"), Curation.WinnowK),
          s => Hashing.md5Long(s)).as("h"))
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), greatest(size(col("h")) - (Curation.WinnowW - 1), lit(1))),
          i => array_min(slice(col("h"), i, lit(Curation.WinnowW)))))).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val native = Curation.winnow(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native === lambda)
    assert(native.nonEmpty)
  }

  test("winnow: short doc (fewer shingles than the window) keeps the global min") {
    val d = docs(20L -> "alpha beta gamma delta") // 2 shingles < W=4 -> one fp = min of both
    val fps = Curation.winnowOfDocs(d).collect().map(_.getLong(1)).toSet
    import org.apache.spark.sql.functions._
    val hs = d.select(explode(
        graft.functions.ShinglesExpression.word_shingles(TextOps.tokens(col("text")), 3)).as("s"))
      .select(conv(substring(md5(col("s")), 1, 14), 16, 10).cast("long").as("h"))
      .collect().map(_.getLong(0))
    assert(hs.length === 2)
    assert(fps === Set(hs.min))
  }

  test("winnow: shared token runs of length >= K+W-1 yield a shared fingerprint") {
    // Winnowing guarantee (SIGMOD'03): a common substring of K+W-1 = 6 tokens
    // spans a full window in both docs, so at least one fp must coincide.
    val shared = "one two three four five six"
    val d = docs(
      30L -> s"unrelated prefix words here $shared trailing stuff",
      31L -> s"$shared other suffix tokens entirely distinct ending")
    val fps = Curation.winnowOfDocs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(30L) & fps(31L)).nonEmpty)
  }

  test("winnow pairs: bucket expansion equals a naive fp self-join at sf0.001") {
    import org.apache.spark.sql.functions._
    val fp = Curation.winnow(spark, Sf)
    val naive = fp.as("a").join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Curation.winnowPairs(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === naive)
    assert(got.nonEmpty, "corpus should contain overlapping docs")
  }

  test("winnow pairs: docs sharing a long token run are paired; disjoint docs are not") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = docs(
      40L -> s"prefix words before $shared and then some trailing text",
      41L -> s"$shared closing with completely different final token mix",
      42L -> "nothing in common with the others whatsoever in any way")
    val pairs = Curation.winnowPairsOfDocs(d, minShared = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((40L, 41L)))
  }

  test("pii redaction drops into a streaming pipeline unchanged (redact-on-ingest)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, "mail a.b@x.co.uk and call 12345678 today"),
      (2L, "clean text"),
      (3L, "id 9999999 then x@y.io"))
    val src = MemoryStream[(Long, String)]
    val q = Curation.piiRedactOfDocs(src.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("pii_stream_test").start()
    try {
      src.addData(rows.take(2): _*); q.processAllAvailable()
      src.addData(rows.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(asSet(spark.table("pii_stream_test"))
      === asSet(Curation.piiRedactOfDocs(rows.toDF("doc_id", "text"))))
  }

  test("contamination: hashed membership equals a string-join recomputation at sf0.001") {
    import org.apache.spark.sql.functions._
    val sh = Dedup.shingles(spark, Sf)
    val bench = sh.filter(col("doc_id") % Curation.BenchmarkMod === 0)
      .select(col("shingle")).distinct().withColumn("hit", lit(1L))
    val expected = sh.filter(col("doc_id") % Curation.BenchmarkMod =!= 0)
      .join(bench, Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("hit")), lit(0L)).as("c"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = Curation.contamination(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    assert(got.values.exists(_._2 > 0), "corpus should show some benchmark overlap")
    // frac is consistent and bounded
    Curation.contamination(spark, Sf).collect().foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(2) <= r.getLong(1))
    }
  }

  test("chunkDocs: stride/coverage/overlap invariants against driver-side tokenization") {
    import org.apache.spark.sql.functions._
    val chunks = Curation.chunkDocs(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val toks = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), TextOps.tokens(col("text")))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val byDoc = chunks.groupBy(_._1)
    toks.filter(_._2.nonEmpty).foreach { case (doc, t) =>
      val cs = byDoc(doc).sortBy(_._2)
      val expectN = (t.length + Curation.ChunkStride - 1) / Curation.ChunkStride
      assert(cs.length === expectN, s"doc $doc: chunk count")
      cs.foreach { case (_, cid, start, n, hash) =>
        assert(start === cid * Curation.ChunkStride)
        assert(n === math.min(Curation.ChunkTokens, t.length - start).toLong)
        val expected = t.slice(start.toInt, (start + n).toInt).mkString(" ")
        val md = java.security.MessageDigest.getInstance("MD5")
        val expectedHash = md.digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(hash === expectedHash, s"doc $doc chunk $cid content fingerprint")
      }
      // the final chunk always reaches the document's end
      val last = cs.last
      assert(last._3 + last._4 === t.length.toLong)
    }
    assert(byDoc.keySet === toks.filter(_._2.nonEmpty).keySet)
  }

  test("ccnet_buckets: per-lang terciles balance, head scores dominate tail, counts reconcile") {
    val buckets = Curation.ccnetBuckets(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val scoredPerLang = Curation.lmScore(spark, Sf)
      .join(graft.Tables.documents(spark, Sf).select("doc_id", "lang"), "doc_id")
      .collect().groupBy(_.getString(3)).view.mapValues(_.length.toLong).toMap
    assert(buckets.nonEmpty)
    buckets.keys.map(_._1).toSet.foreach { lang: String =>
      val h = buckets.get((lang, "head")); val m = buckets.get((lang, "middle"))
      val t = buckets.get((lang, "tail"))
      val counts = Seq(h, m, t).flatten.map(_._1)
      // ntile balance: any two buckets differ by at most one doc
      assert(counts.max - counts.min <= 1, s"$lang terciles unbalanced: $counts")
      assert(counts.sum === scoredPerLang(lang), s"$lang bucket counts must reconcile")
      // desc-score terciles: head's floor >= middle's ceiling >= tail's ceiling
      for (a <- h; b <- m) assert(a._3 >= b._4, s"$lang head floor below middle ceiling")
      for (b <- m; c <- t) assert(b._3 >= c._4, s"$lang middle floor below tail ceiling")
      Seq(h, m, t).flatten.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
    }
  }

  test("corpus_diff: every op class lands exactly where the residues put it (crafted)") {
    import spark.implicits._
    // residue plan: v1 excludes doc_id%7==3, truncates doc_id%5==2 to half;
    // v2 excludes doc_id%11==4.
    val d = Seq(
      (1L, "s0", "alpha beta gamma"),        // in both, untouched -> unchanged
      (3L, "s0", "brand new document"),      // 3%7=3: absent from v1 -> added
      (4L, "s1", "doomed document"),         // 4%11=4: absent from v2 -> removed
      (2L, "s1", "abcdefgh"),                // 2%5=2: v1 holds "abcd" -> changed
      (12L, "s0", "x"),                      // 12%5=2: v1 holds "" -> changed
      (25L, "s1", "steady content here")     // 25%7=4, 25%5=0, 25%11=3 -> unchanged
    ).toDF("doc_id", "source", "text")
    val got = Curation.corpusDiffOf(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(("s0", "unchanged")) === ((1L, 16L, 16L, 0L)))
    assert(got(("s0", "added")) === ((1L, 0L, 18L, 18L)))
    assert(got(("s1", "removed")) === ((1L, 15L, 0L, -15L)))
    // changed rows: chars_old counts the v1 (truncated) text
    assert(got(("s1", "changed")) === ((1L, 4L, 8L, 4L)))
    assert(got(("s0", "changed")) === ((1L, 0L, 1L, 1L)))
    assert(got(("s1", "unchanged")) === ((1L, 19L, 19L, 0L)))
    assert(got.size === 6, s"exactly one row per exercised (source, op): ${got.keys}")
  }

  test("split_leakage: the cluster split cannot leak; the doc split leaks the crafted straddling pair") {
    import spark.implicits._
    val ids = (0L until 200L)
    val evalIds = ids.filter(i => Hashing.md5LongJvm(i.toString) % Curation.SplitEvalMod == 0)
    val trainIds = ids.filter(i => Hashing.md5LongJvm(i.toString) % Curation.SplitEvalMod != 0)
    assert(evalIds.nonEmpty && trainIds.size >= 2)
    // a near-dup pair built to straddle the naive split
    val (a, b) = (evalIds.head, trainIds.head)
    val docs = Seq(a, b, trainIds(1)).toDF("doc_id")
    val pairs = Seq((math.min(a, b), math.max(a, b))).toDF("doc_a", "doc_b")
    val got = Curation.splitLeakageOf(docs, pairs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(("doc_hash"))._3 === 1L, "the crafted pair must straddle the doc-hash split")
    assert(got(("cluster_hash"))._3 === 0L, "cluster members share a hash: leakage impossible")
    assert(got(("doc_hash"))._1 + got(("doc_hash"))._2 === 3L)
    assert(got(("cluster_hash"))._1 + got(("cluster_hash"))._2 === 3L)
  }

  test("split_leakage on the real corpus: cluster strategy leak-free, totals reconcile") {
    val nDocs = graft.Tables.documents(spark, Sf).count()
    val got = Curation.splitLeakage(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === Set("doc_hash", "cluster_hash"))
    got.values.foreach { case (tr, ev, _) => assert(tr + ev === nDocs) }
    assert(got(("cluster_hash"))._3 === 0L,
      "splitting by dedup-cluster hash must leak zero near-dup pairs")
    assert(got(("doc_hash"))._3 >= got(("cluster_hash"))._3)
  }
}
