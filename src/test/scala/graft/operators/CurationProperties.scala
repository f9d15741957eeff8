package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** Randomized properties for the curation operators — the guarantees their
  * scaladoc sells, exercised on generated corpora instead of one fixture.
  * Sample counts are small because every case runs real Spark jobs. */
object CurationProperties extends Properties("graft.curation") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark

  private val word: Gen[String] = Gen.choose(0, 40).map(i => s"w$i")
  private val doc: Gen[List[String]] = Gen.choose(6, 30).flatMap(n => Gen.listOfN(n, word))

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  property("winnowing guarantee: a shared run of K+W-1 tokens ⇒ a shared fingerprint") =
    forAll(doc, doc, Gen.listOfN(Curation.WinnowK + Curation.WinnowW - 1, word)) {
      (a, b, shared) =>
        val d = docsDf(
          1L -> (a ++ shared).mkString(" "),
          2L -> (shared ++ b).mkString(" "))
        val fps = Curation.winnowOfDocs(d).collect()
          .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
          .view.mapValues(_.map(_._2).toSet).toMap
        (fps(1L) & fps(2L)).nonEmpty
    }

  private val piiText: Gen[String] = for {
    u <- Gen.alphaLowerStr.map(s => "u" + s.take(7))
    d <- Gen.alphaLowerStr.map(s => "d" + s.take(7))
    num <- Gen.choose(1000000L, 999999999L)
  } yield s"contact $u@$d.com or $num now"

  property("PII redaction is idempotent (re-redacting is a no-op with zero matches)") =
    forAll(piiText) { text =>
      import org.apache.spark.sql.functions._
      val once = Curation.piiRedactOfDocs(docsDf(1L -> text)).collect().head
      val redacted = docsDf(1L -> text)
        .select(col("doc_id"),
          regexp_replace(regexp_replace(col("text"), Curation.EmailRe, "<EMAIL>"),
            Curation.NumberRe, "<NUM>").as("text"))
      val twice = Curation.piiRedactOfDocs(redacted).collect().head
      once.getLong(1) == 1L && once.getLong(2) == 1L &&
        twice.getLong(1) == 0L && twice.getLong(2) == 0L &&
        twice.getString(3) == once.getString(3)
    }

  property("pagerank: every node of a regular graph (cycle) gets the identical rank") =
    forAll(Gen.choose(3, 12)) { n =>
      import spark.implicits._
      val cycle = (0L until n.toLong).map(i => (i, (i + 1) % n)).toDF("doc_a", "doc_b")
      Dedup.pagerankOfPairs(cycle).collect().map(_.getLong(1)).toSet.size == 1
    }
}
