package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

/** BPE tokenizer training: the distributed replace-chain implementation is
  * proven against a driver-side scan-based reference (the Sennrich
  * algorithm, merging greedily left-to-right), and the encode path is
  * proven equal to training's incremental state. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  /** Sennrich-style reference: greedy left-to-right scan merge over an
    * in-memory weighted vocabulary. Deliberately a DIFFERENT mechanism from
    * the engine's string replace — agreement proves the replace-chain
    * encodes the same merge semantics. */
  private def refBpe(words: Map[String, Long], numMerges: Int)
      : Seq[(Long, String, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, n) => (w.map(_.toString).toVector :+ Bpe.EndOfWord) -> n }
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    for (rank <- 1 to numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + n
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((rank.toLong, a, b, a + b, cnt))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += (a + b); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.result()
        } { case (_, n) => n }(_ + _)
      }
    }
    out.result()
  }

  test("bpeTrain matches the scan-based reference merge-for-merge at sf0.001") {
    val words = Tables.documents(spark, Sf)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refBpe(words, 20)
    val got = Bpe.bpeTrain(spark, Sf, 20).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq.sortBy(_._1)
    assert(got === want)
  }

  test("bpeTrain's first merge is bpePairCounts' top row (iteration-0 correspondence)") {
    val top = Bpe.bpePairCounts(spark, Sf, k = 1).collect()(0)
    val first = Bpe.bpeTrain(spark, Sf, numMerges = 1).collect()(0)
    assert((first.getString(1), first.getString(2), first.getLong(4)) ===
      (top.getString(0), top.getString(1), top.getLong(2)))
  }

  test("encode path: re-applying the merge list reproduces training's final state") {
    val merges = Bpe.bpeTrain(spark, Sf, 12).collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    // fresh symbolization + one folded replace chain (how a corpus is
    // re-tokenized after training)…
    val fresh = Tables.documents(spark, Sf)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(Bpe.bpeApply(merges)(concat(lit(" "),
        array_join(regexp_extract_all(col("w"), lit("."), lit(0)), " "),
        lit(s" ${Bpe.EndOfWord} "))).as("sym"), col("n"))
    // …must equal replaying training's incremental merges (which it is,
    // by construction of bpeApply — this guards the fold order).
    val replayed = Tables.documents(spark, Sf)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(merges.foldLeft(concat(lit(" "),
        array_join(regexp_extract_all(col("w"), lit("."), lit(0)), " "),
        lit(s" ${Bpe.EndOfWord} "))) { case (c, (a, b)) =>
        Bpe.bpeApply(Seq((a, b)))(c) }.as("sym"), col("n"))
    assert(fresh.exceptAll(replayed).isEmpty && replayed.exceptAll(fresh).isEmpty)
    // and segmentation is lossless: strip spaces + marker = the word
    val broken = Tables.documents(spark, Sf)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .select(col("w"), Bpe.bpeApply(merges)(concat(lit(" "),
        array_join(regexp_extract_all(col("w"), lit("."), lit(0)), " "),
        lit(s" ${Bpe.EndOfWord} "))).as("sym"))
      .filter(replace(replace(col("sym"), lit(" ")), lit(Bpe.EndOfWord)) =!= col("w"))
    assert(broken.count() === 0, "BPE segmentation must be lossless")
  }

  test("pair counts: marker pairs present; totals equal sum of word lengths") {
    val full = Bpe.bpePairCounts(spark, Sf, k = 10000).collect()
    assert(full.exists(_.getString(1) == Bpe.EndOfWord),
      "end-of-word pairs must be counted")
    // each word of length L contributes exactly L pairs (L-1 inner + marker)
    val want = Tables.documents(spark, Sf)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .agg(sum(length(col("w")))).collect()(0).getLong(0)
    assert(full.map(_.getLong(2)).sum === want)
  }

  test("bpeEncode: per-doc token counts match a driver scan-merge reference") {
    val numMerges = 20
    val merges = Bpe.bpeTrain(spark, Sf, numMerges).collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    // Scan-merge encoder (same mechanism family as refBpe, NOT a string
    // replace): apply each merge greedily left-to-right in training order.
    def encLen(w: String): Long = {
      var syms = w.map(_.toString).toVector :+ Bpe.EndOfWord
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length.toLong
    }
    // Tokenization via the engine's own tokens() so the reference diffs
    // ONLY the encode step.
    val docToks = Tables.documents(spark, Sf)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val encCache = scala.collection.mutable.Map.empty[String, Long]
    val want = docToks.groupBy(_._1).map { case (doc, ws) =>
      val lens = ws.map(t => encCache.getOrElseUpdate(t._2, encLen(t._2)))
      (doc, ws.length.toLong, lens.sum)
    }.toSet
    val got = Bpe.bpeEncode(spark, Sf, numMerges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)
    // merging can only shrink: per doc, tokens <= bpe symbols <= chars+tokens
    assert(got.forall { case (_, nt, nb) => nb >= nt })
  }

  test("tokenizer_fertility reconciles with bpe_encode per-doc totals and driver char volume") {
    val docs = graft.Tables.documents(spark, Sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val langOf = docs.map(d => d._1 -> d._2).toMap
    // Driver scan-merge encoder (the bpeEncode reference mechanism), kept
    // as full symbol sequences so the test derives BOTH counting rules:
    // bpeEncode's raw symbol count AND fertility's bare-sentinel exclusion.
    val merges = Bpe.bpeTrain(spark, Sf, 20).collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    def encSyms(w: String): Vector[String] = {
      var syms = w.map(_.toString).toVector :+ Bpe.EndOfWord
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    val symCache = scala.collection.mutable.Map.empty[String, Vector[String]]
    def toks(t: String) = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq
    def nsOf(w: String): Long = {
      val s = symCache.getOrElseUpdate(w, encSyms(w))
      s.length.toLong - (if (s.last == Bpe.EndOfWord) 1L else 0L)
    }
    val enc = Bpe.bpeEncode(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val encPerLang = enc.groupBy(t => langOf(t._1)).view
      .mapValues(rs => (rs.map(_._2).sum, rs.map(_._3).sum)).toMap
    val wantPerLang = docs.groupBy(_._2).view.mapValues { ds =>
      val ws = ds.flatMap(d => toks(d._3))
      (ws.size.toLong, ws.iterator.map(nsOf).sum,
        ws.iterator.map(_.length.toLong).sum,
        // word instances whose encoding ends in a bare sentinel — the exact
        // amount by which fertility's token volume undercuts bpe_encode's
        // raw symbol volume
        ws.iterator.count(w => symCache.getOrElseUpdate(w, encSyms(w))
          .last == Bpe.EndOfWord).toLong)
    }.toMap
    val got = Bpe.tokenizerFertility(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet === wantPerLang.keySet)
    got.foreach { case (lang, (nw, nb, nc, fert, cpt)) =>
      val (wnw, wnb, wnc, bareSentinels) = wantPerLang(lang)
      assert((nw, nb, nc) === ((wnw, wnb, wnc)),
        s"$lang volumes must match the driver scan-merge reference")
      // reconciliation with bpe_encode: raw symbol volume minus the bare
      // sentinels IS fertility's token volume (and word counts agree)
      assert(nw === encPerLang(lang)._1, s"$lang word volume vs bpe_encode")
      assert(nb === encPerLang(lang)._2 - bareSentinels,
        s"$lang token volume must be bpe_encode's symbol volume less bare sentinels")
      assert(fert === nb * 1000000L / nw)
      assert(cpt === nc * 1000000L / nb)
      assert(fert >= 1000000L, s"$lang: a word cannot encode to fewer than 1 token")
    }
  }
}
