package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ground-truth checks for the fixed-point ranking operators: an
  * independent driver-side reimplementation (plain Scala collections, Long
  * arithmetic) over the sf0.001 corpus must produce identical rows. */
class RankingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  private def tokenize(text: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq

  private lazy val corpus: Seq[(Long, Seq[String])] = {
    import spark.implicits._
    graft.Tables.documents(spark, Sf).select("doc_id", "text").as[(Long, String)]
      .collect().toSeq.map { case (id, t) => (id, tokenize(t)) }
  }

  test("tfidf_top_terms equals the driver-side reimplementation") {
    val n = corpus.size.toLong
    val tf = corpus.flatMap { case (id, toks) =>
      toks.groupBy(identity).map { case (t, os) => (id, t, os.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t, rows) => (t, rows.size.toLong) }
    val expected = tf.groupBy(_._1).flatMap { case (id, rows) =>
      rows.map { case (_, t, f) => (id, t, f, df(t), f * ((Ranking.Scale * n) / df(t))) }
        .toSeq.sortBy { case (_, t, _, _, s) => (-s, t) }
        .take(3).zipWithIndex
        .map { case ((i, t, f, d, s), k) => (i, t, f, d, s, k + 1L) }
    }.toSet
    val got = Ranking.tfIdfTopTerms(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === expected)
  }

  test("bm25_rank equals the driver-side fixed-point reimplementation") {
    val docs = corpus.filter(_._2.nonEmpty)
    val nDocs = docs.size.toLong
    val sumDl = docs.map(_._2.size.toLong).sum
    val tf = docs.flatMap { case (id, toks) =>
      toks.filter(Ranking.Bm25Query.contains).groupBy(identity)
        .map { case (t, os) => (id, t, os.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t, rows) => (t, rows.size.toLong) }
    val dl = docs.map { case (id, toks) => id -> toks.size.toLong }.toMap
    val S = Ranking.Scale
    val expected = tf.groupBy(_._1).map { case (id, rows) =>
      val score = rows.map { case (_, t, f) =>
        val idf = ((2 * (nDocs - df(t)) + 1) * S) / (2 * df(t) + 1)
        val denom = f * S + 300000L + (900000L * dl(id) * nDocs) / sumDl
        (idf * f * 22 * 10000) / denom
      }.sum
      (id, score, rows.size.toLong)
    }.toSeq.sortBy { case (id, s, _) => (-s, id) }.take(20)
    val got = Ranking.bm25Rank(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("doc_novelty: first doc is fully novel, a duplicated doc's shingles are owned by the earlier one") {
    val shingles: Seq[(Long, Set[String])] = corpus.map { case (id, toks) =>
      (id, toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet)
    }.filter(_._2.nonEmpty)
    val firstDoc = shingles.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).map { case (s, rows) => (s, rows.map(_._2).min) }
    val expected = shingles.map { case (id, ss) =>
      val novel = ss.count(s => firstDoc(s) == id).toLong
      (id, ss.size.toLong, novel, (Ranking.Scale * novel) / ss.size)
    }.toSet
    val got = Curation.novelty(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
    // the corpus's earliest shingled doc must be fully novel
    val minId = shingles.map(_._1).min
    assert(got.find(_._1 == minId).get._4 === Ranking.Scale)
  }

  test("embedding_centroids equals the driver-side fixed-point reimplementation") {
    import spark.implicits._
    val vecs = graft.Tables.embeddings(spark, Sf)
      .select("label", "embedding").as[(Int, Array[Float])].collect().toSeq
    val expected = vecs.flatMap { case (label, v) =>
      v.zipWithIndex.map { case (x, dim) =>
        ((label.toLong, dim.toLong), math.floor(x.toDouble * 1000000).toLong)
      }
    }.groupBy(_._1).map { case ((label, dim), rows) =>
      val sum = rows.map(_._2).sum
      val n = rows.size.toLong
      (label, dim, n, sum, sum / n) // Long / truncates toward zero, like div and //
    }.toSet
    val got = Similarity.embeddingCentroids(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got === expected)
    assert(got.exists(_._4 < 0), "corpus must exercise the negative-sum division path")
  }

  test("kmeans_train equals a driver-side Lloyd's reimplementation (3 iterations, fixed-point updates)") {
    import spark.implicits._
    val vecs = graft.Tables.embeddings(spark, Sf)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)
    var cents: Seq[(Long, Array[Double])] = vecs.filter(_._1 < Similarity.KmeansK)
      .map { case (id, v) => (id, v.map(_.toDouble)) }
    var update: Map[(Long, Long), (Long, Long)] = Map.empty // (cluster, dim) -> (n, sum_fp)
    for (_ <- 1 to Similarity.KmeansIters) {
      val assigned = vecs.map { case (id, v) =>
        val best = cents.map { case (cl, c) =>
          val dot = v.indices.foldLeft(0.0)((acc, i) => acc + v(i).toDouble * c(i))
          val norm = math.sqrt(c.foldLeft(0.0)((acc, x) => acc + x * x))
          (cl, dot / norm)
        }.minBy { case (cl, s) => (-s, cl) }._1
        (best, v)
      }
      update = assigned.flatMap { case (cl, v) =>
        v.zipWithIndex.map { case (x, dim) =>
          ((cl, dim.toLong), math.floor(x.toDouble * 1000000).toLong)
        }
      }.groupBy(_._1).map { case (key, rows) =>
        key -> (rows.size.toLong, rows.map(_._2).sum)
      }
      cents = update.toSeq.groupBy(_._1._1).toSeq.map { case (cl, rows) =>
        (cl, rows.sortBy(_._1._2).map { case (_, (n, s)) => (s / n) / 1000000.0 }.toArray)
      }.sortBy(_._1)
    }
    val expected = update.map { case ((cl, dim), (n, s)) => (cl, dim, n, s / n) }.toSet
    val got = Similarity.kmeansTrain(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
    assert(got.map(_._1).toSeq.distinct.size > 1, "training must keep multiple clusters")
  }

  test("token_histogram equals the driver-side binning") {
    val expected = corpus.map(_._2.size.toLong).groupBy(_ / 32)
      .map { case (bin, ns) => (bin, ns.size.toLong, ns.sum) }.toSet
    val got = TextAnalysis.tokenHistogram(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("shard_assign: md5-derived shards, contiguous positions per shard") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val ids = corpus.map(_._1)
    val expected = ids.map { id =>
      val hex = md5hex(id.toString)
      (id, java.lang.Long.parseLong(hex.take(14), 16) % Sampling.NumShards, hex)
    }.groupBy(_._2).flatMap { case (shard, rows) =>
      rows.sortBy { case (id, _, hex) => (hex, id) }.zipWithIndex
        .map { case ((id, _, _), i) => (id, shard, i + 1L) }
    }.toSet
    val got = Sampling.shardAssign(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("inverted_postings: df cap drops the ubiquitous term, positions are exact, top-k by impact") {
    // Crafted corpus the flat synthetic vocabulary can't provide: "the"
    // appears in all 4 docs (df 4/4 > 9/10 cap → dropped); "rare" in one.
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog the dog barks"),
      (3L, "the cat naps"),
      (4L, "rare the word")).toDF("doc_id", "text")
    val got = Ranking.invertedPostingsOf(docs, topK = 2, dfCapNum = 9, dfCapDen = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5))).toSet
    assert(!got.exists(_._1 == "the"), "df 4/4 term must be capped out")
    // cat: doc1 pos 1, doc3 pos 1 → tf ties broken by doc_id
    assert(got.contains(("cat", 1L, 1L, "1", 2L, 1L)))
    assert(got.contains(("cat", 3L, 1L, "1", 2L, 2L)))
    // dog: tf 2 in doc2 at positions 1,3 (0-based)
    assert(got.contains(("dog", 2L, 2L, "1,3", 1L, 1L)))
    assert(got.contains(("rare", 4L, 1L, "0", 1L, 1L)))
    // top-k: no term carries more than 2 postings
    assert(got.groupBy(_._1).values.forall(_.size <= 2))
  }

  test("doc_sim_sparse equals the driver-side reimplementation at sf0.001") {
    val expected = docSimReference(corpus, Ranking.DocSimPrefix, Ranking.DocSimTopK)
    val got = Ranking.docSimSparse(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
  }

  test("doc_sim_sparse: prefix truncation drops pairs a full index keeps; identical docs score exactly 1e6") {
    import spark.implicits._
    // One shared term with tf ladder 3/2/1: a prefix of R=2 keeps docs 1,2 —
    // doc 3 can never pair. Orthogonal doc 4 shares no term with anyone.
    val docs = Seq(
      (1L, "x x x"), (2L, "x x"), (3L, "x"), (4L, "y z")
    ).toDF("doc_id", "text")
    val got = Ranking.docSimSparseOf(docs, prefixR = 2, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toSeq
    // single surviving candidate pair; colinear 1-term vectors → cos² = 1
    assert(got === Seq((1L, 2L, 1000000L)))
    // sanity against the same reference implementation
    val ref = docSimReference(
      Seq((1L, Seq("x", "x", "x")), (2L, Seq("x", "x")), (3L, Seq("x")),
        (4L, Seq("y", "z"))), 2, 10)
    assert(ref.map(t => (t._1, t._2, t._6)) === got)
  }

  /** Plain-Scala twin of the operator's contract: impact-prefix candidate
    * generation + exact tf-cosine on candidates, same fixed-point form. */
  private def docSimReference(docs: Seq[(Long, Seq[String])], prefixR: Int,
                              topK: Int): Seq[(Long, Long, Long, Long, Long, Long)] = {
    val tf: Map[(Long, String), Long] = docs.flatMap { case (id, toks) =>
      toks.groupBy(identity).map { case (t, os) => ((id, t), os.size.toLong) }
    }.toMap
    val norms: Map[Long, Long] = tf.toSeq.groupBy(_._1._1)
      .map { case (id, rs) => id -> rs.map(x => x._2 * x._2).sum }
    val prefix: Map[String, Seq[Long]] = tf.toSeq.groupBy(_._1._2)
      .map { case (t, rs) =>
        t -> rs.map { case ((id, _), f) => (id, f) }
          .sortBy { case (id, f) => (-f, id) }.take(prefixR).map(_._1)
      }
    val cand = prefix.values.flatMap(ids =>
      for (a <- ids; b <- ids if a < b) yield (a, b)).toSet
    cand.toSeq.map { case (a, b) =>
      val terms = docs.find(_._1 == a).get._2.toSet & docs.find(_._1 == b).get._2.toSet
      val dot = terms.toSeq.map(t => tf((a, t)) * tf((b, t))).sum
      val (na, nb) = (norms(a), norms(b))
      (a, b, dot, na, nb, dot * dot * 1000000L / (na * nb))
    }.sortBy { case (a, b, _, _, _, c2) => (-c2, a, b) }.take(topK)
  }
}
