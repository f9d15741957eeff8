package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-hygiene operators a training-data pipeline runs before any model
  * sees the data: benchmark-contamination measurement, boilerplate/repetition
  * scoring, winnowing fingerprints, and PII redaction. Like every operator in
  * this engine they are DataFrame → DataFrame expressions with DuckDB oracle
  * twins, and their plans are shaped for the 100 TB case:
  *
  *  - [[contamination]]: corpus shingles are map-side hashed to int64 and the
  *    (small, fixed) benchmark shingle set is broadcast — the corpus itself is
  *    never shuffled by the membership probe, only by the final per-doc agg.
  *  - [[repetition]]: one (doc, bigram) partial-agg shuffle, then a per-doc
  *    rollup — shuffle volume bounded by distinct bigrams, not tokens.
  *  - [[winnow]]: a pure per-document map (array lambdas, zero shuffle) — at
  *    scale it runs at scan speed like the quality/token operators.
  *  - [[piiRedact]]: pure map, codegen'd regexes, no shuffle at all.
  */
object Curation {

  /** "Benchmark" membership for the contamination check: doc_id ≡ 0 (mod 97)
    * simulates the held-out eval set. In production the benchmark shingle set
    * comes from a separate fixed-size table (MMLU/GSM8K/... dumps), which is
    * exactly why the plan broadcasts it: the eval side does NOT grow with the
    * training corpus. */
  val BenchmarkMod = 97

  /** Per-document benchmark contamination: the fraction of a candidate
    * document's distinct word-3-gram shingles that also occur anywhere in the
    * benchmark set (the n-gram-overlap decontamination test from the GPT-3 /
    * PaLM data papers, as one DataFrame expression).
    *
    * Shingles are hashed to int64 (14 hex chars of md5 — the same portable
    * hash used by MinHash) before the membership join, so the broadcast holds
    * longs, not 3-word strings, and the probe is a hash lookup inside the
    * scan stage. Output: one row per non-benchmark doc that has ≥1 shingle.
    */
  def contamination(spark: SparkSession, sfDir: String): DataFrame =
    contaminationOfShingles(Dedup.shingles(spark, sfDir))

  /** Core of [[contamination]] over any (doc_id, shingle) set — split out so
    * specs can feed crafted corpora. */
  def contaminationOfShingles(shingles: DataFrame): DataFrame = {
    val hs = shingles.select(col("doc_id"), Hashing.md5Long(col("shingle")).as("h"))
    val bench = hs.filter(col("doc_id") % BenchmarkMod === 0)
      .select(col("h")).distinct().withColumn("hit", lit(1L))
    hs.filter(col("doc_id") % BenchmarkMod =!= 0)
      .join(broadcast(bench), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum(col("hit")), lit(0L)).as("n_contaminated"))
      .withColumn("contamination_frac",
        round(col("n_contaminated").cast("double") / col("n_shingles").cast("double"), 6))
  }

  def contaminationSql: String =
    s"""WITH ${Dedup.shinglesSql(3)},
       |hs AS (SELECT doc_id, ${Hashing.md5LongSql("shingle")} AS h FROM sh),
       |bench AS (SELECT DISTINCT h FROM hs WHERE doc_id % $BenchmarkMod = 0),
       |doc AS (SELECT doc_id, hs.h, bench.h AS bh FROM hs LEFT JOIN bench ON hs.h = bench.h
       |        WHERE doc_id % $BenchmarkMod <> 0)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(sum(CASE WHEN bh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       |  round(CAST(sum(CASE WHEN bh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE), 6) AS contamination_frac
       |FROM doc GROUP BY doc_id""".stripMargin

  /** SPAN-level benchmark contamination — the gaps-and-islands sequence
    * pattern over shingle positions: [[contamination]] reports the overlap
    * FRACTION, but decontamination policy (Lee et al., PaLM) keys on
    * contiguous RUNS — a 50-shingle verbatim span is an excerpt to cut
    * where 50 scattered hits are shared phrasing to keep. Per contaminated
    * doc: number of maximal contaminated runs, the longest run, and the
    * total contaminated positions (Σ run lengths — positional, so ≥ the
    * distinct-shingle count [[contamination]] uses).
    *
    * Islands without self-joins: contaminated positions minus their
    * per-doc row_number are constant exactly within a consecutive run, so
    * one doc-keyed window + one (doc, grp) aggregation finds every span.
    * Shape: the benchmark set broadcasts as int64 hashes (the corpus is
    * never shuffled by membership), then ONE doc_id exchange shared by the
    * window and both aggregations. */
  def contaminationSpans(spark: SparkSession, sfDir: String): DataFrame =
    contaminationSpansOfDocs(Tables.documents(spark, sfDir))

  /** Core of [[contaminationSpans]] over any (doc_id, text) frame. */
  private[graft] def contaminationSpansOfDocs(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pos = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), posexplode(
        graft.functions.ShinglesExpression.word_shingles(col("t"), 3)))
      .select(col("doc_id"), col("pos"),
        Hashing.md5Long(col("col")).as("h"))
      .localCheckpoint() // benchmark derivation + corpus probe share it
    val bench = pos.filter(col("doc_id") % BenchmarkMod === 0)
      .select(col("h")).distinct()
    val hits = pos.filter(col("doc_id") % BenchmarkMod =!= 0)
      .join(broadcast(bench), Seq("h"), "left_semi")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    hits.withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), max(col("len")).as("max_span"),
        sum(col("len")).as("n_contaminated_pos"))
  }

  val contaminationSpansSql: String =
    s"""WITH toks AS (SELECT doc_id, ${TextOps.tokensSql} AS t FROM documents),
       |p AS (SELECT doc_id, i - 1 AS pos,
       |    ${Hashing.md5LongSql("t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]")} AS h
       |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) g
       |  WHERE len(t) >= 3),
       |bench AS (SELECT DISTINCT h FROM p WHERE doc_id % $BenchmarkMod = 0),
       |hits AS (SELECT doc_id, pos FROM p
       |  WHERE doc_id % $BenchmarkMod <> 0 AND h IN (SELECT h FROM bench)),
       |isl AS (SELECT doc_id,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM hits),
       |runs AS (SELECT doc_id, grp, count(*) AS len FROM isl GROUP BY 1, 2)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |  CAST(max(len) AS BIGINT) AS max_span,
       |  CAST(sum(len) AS BIGINT) AS n_contaminated_pos
       |FROM runs GROUP BY doc_id""".stripMargin

  /** Verdict thresholds for [[contaminationVerdict]]. Production recipes
    * run stricter values (PaLM cuts on a 70% high-order-n-gram overlap;
    * Lee et al. cut 50-token verbatim spans); these are scaled to the test
    * corpus so each signal INDEPENDENTLY decides some documents at sf0.01
    * (measured: frac ≥ 0.1 drops 2 docs the other signals miss, span ≥ 3
    * drops 1, the semantic probe 30 — 33 of 494 candidates dropped). Both
    * are parameters; the policy shape, not the constants, is the operator. */
  val VerdictFracTau = 0.1
  val VerdictSpanTau = 3L

  /** COMPOSITE DECONTAMINATION VERDICT — the per-document keep/drop card a
    * production decontamination pass acts on (the GPT-4 / Llama report
    * recipe runs ALL the overlap probes, then drops once): joins the three
    * contamination signals this engine computes —
    *
    *   - n-gram overlap fraction ([[contamination]] — scattered shared
    *     shingles, the GPT-3/PaLM membership test),
    *   - longest verbatim run ([[contaminationSpans]] — contiguous
    *     excerpts, the Lee et al. policy key), and
    *   - embedding cosine vs the eval set
    *     ([[Similarity.contaminationSemantic]] — paraphrase leakage no
    *     string probe can see) —
    *
    * into one row per training-candidate doc carrying each signal's value
    * and the policy verdict: drop iff overlap ≥ `fracTau` OR a verbatim
    * run ≥ `spanTau` OR any semantic hit. The two n-gram signals use the
    * doc_id ≡ 0 (mod [[BenchmarkMod]]) benchmark convention; the semantic
    * probe uses its fixed eval vec_id range — mirroring production, where
    * string and embedding probes run against separately-prepared benchmark
    * dumps. Docs outside the n-gram path's reach (under 3 tokens, zero
    * shingles) still get a card: the semantic signal alone can drop them.
    *
    * Scale shape: each signal keeps its own optimal plan (one corpus scan
    * each — [[contamination]]'s broadcast probe, [[contaminationSpans]]'
    * shared-exchange islands, the semantic pass's broadcast-scored argmax);
    * composition adds three LEFT joins keyed on doc_id over narrow per-doc
    * frames — at 100 TB all three co-partition on the same key, and the
    * semantic side is only the |flagged| rows. Not wired into
    * [[Sampling.trainingMixFull]]: see the measured decision in PLANS.md —
    * the flagship's gate chain is text-only by design (its contamination
    * gate shares the checkpointed tokenize scan; the semantic signal needs
    * the embeddings table, a different input surface), so the composite
    * chains AFTER the mix as `anti-join on drop_doc` exactly like a
    * production decontamination stage. */
  def contaminationVerdict(spark: SparkSession, sfDir: String,
      fracTau: Double = VerdictFracTau, spanTau: Long = VerdictSpanTau): DataFrame =
    contaminationVerdictOf(
      Tables.documents(spark, sfDir).select(col("doc_id")),
      contamination(spark, sfDir),
      contaminationSpans(spark, sfDir),
      Similarity.contaminationSemantic(spark, sfDir),
      fracTau, spanTau)

  /** Core of [[contaminationVerdict]] over explicit signal frames — specs
    * feed crafted signals to prove each one independently flips the
    * verdict. `frac`/`spans` carry the registered queries' schemas keyed
    * by doc_id; `semantic` is keyed by vec_id (≡ doc_id in this corpus). */
  private[graft] def contaminationVerdictOf(docs: DataFrame, frac: DataFrame,
      spans: DataFrame, semantic: DataFrame,
      fracTau: Double, spanTau: Long): DataFrame =
    docs.filter(col("doc_id") % BenchmarkMod =!= 0)
      .join(frac.select(col("doc_id"), col("contamination_frac")), Seq("doc_id"), "left")
      .join(spans.select(col("doc_id"), col("max_span")), Seq("doc_id"), "left")
      .join(semantic.select(col("vec_id").as("doc_id"), col("cos_sim")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("contamination_frac"), lit(0.0)).as("contamination_frac"),
        coalesce(col("max_span"), lit(0L)).as("max_span"),
        coalesce(col("cos_sim"), lit(0.0)).as("semantic_cos"),
        (coalesce(col("contamination_frac"), lit(0.0)) >= fracTau ||
          coalesce(col("max_span"), lit(0L)) >= spanTau ||
          col("cos_sim").isNotNull).as("drop_doc"))

  /** DuckDB twin: composes the three signals' own oracle texts as derived
    * tables (the [[Sampling.trainingMixFullSql]] lockstep discipline — a
    * change to any signal's derivation reaches both engines' composites by
    * construction), then the same LEFT joins and policy expression. */
  def contaminationVerdictSql(fracTau: Double = VerdictFracTau,
      spanTau: Long = VerdictSpanTau): String =
    s"""WITH fr AS (SELECT doc_id, contamination_frac FROM ($contaminationSql)),
       |sp AS (SELECT doc_id, max_span FROM ($contaminationSpansSql)),
       |se AS (SELECT vec_id, cos_sim FROM (${Similarity.contaminationSemanticSql()}))
       |SELECT d.doc_id,
       |  coalesce(fr.contamination_frac, 0.0) AS contamination_frac,
       |  CAST(coalesce(sp.max_span, 0) AS BIGINT) AS max_span,
       |  coalesce(se.cos_sim, 0.0) AS semantic_cos,
       |  (coalesce(fr.contamination_frac, 0.0) >= $fracTau
       |    OR coalesce(sp.max_span, 0) >= $spanTau
       |    OR se.vec_id IS NOT NULL) AS drop_doc
       |FROM documents d
       |LEFT JOIN fr ON fr.doc_id = d.doc_id
       |LEFT JOIN sp ON sp.doc_id = d.doc_id
       |LEFT JOIN se ON se.vec_id = d.doc_id
       |WHERE d.doc_id % $BenchmarkMod <> 0""".stripMargin

  /** Corpus-INTERNAL duplicated spans — exact-substring dedup in the style
    * of "Deduplicating Training Data Makes Language Models Better" (Lee et
    * al., 2022): per document, the contiguous runs of word-3-gram positions
    * whose shingle also occurs in at least one OTHER document. Where
    * [[contaminationSpans]] probes an external benchmark set, this finds
    * boilerplate shared anywhere inside the corpus itself — the spans a
    * substring-level deduper would cut before training.
    *
    * Shape: ONE shingle pass (localCheckpoint'ed) feeds both the
    * document-frequency aggregation and the position probe. The shared
    * set is joined back as a shuffle semi-join on the shingle hash — NOT
    * broadcast, because unlike the tiny benchmark side the shared-shingle
    * set grows with the corpus. Spans come from the same gaps-and-islands
    * window, one doc-keyed shuffle. Everything is bounded by the shingle
    * stream; nothing is quadratic in documents. */
  def dupSpans(spark: SparkSession, sfDir: String): DataFrame =
    dupSpansOfDocs(Tables.documents(spark, sfDir))

  private[graft] def dupSpansOfDocs(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pos = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), posexplode(
        graft.functions.ShinglesExpression.word_shingles(col("t"), 3)))
      .select(col("doc_id"), col("pos"),
        Hashing.md5Long(col("col")).as("h"))
      .localCheckpoint() // df aggregation + position probe share one pass
    val shared = pos.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2).select(col("h"))
    val hits = pos.join(shared, Seq("h"), "left_semi")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    hits.withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), max(col("len")).as("max_span"),
        sum(col("len")).as("n_dup_pos"))
  }

  val dupSpansSql: String =
    s"""WITH toks AS (SELECT doc_id, ${TextOps.tokensSql} AS t FROM documents),
       |p AS (SELECT doc_id, i - 1 AS pos,
       |    ${Hashing.md5LongSql("t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]")} AS h
       |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) g
       |  WHERE len(t) >= 3),
       |shared AS (SELECT h FROM p GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |hits AS (SELECT doc_id, pos FROM p WHERE h IN (SELECT h FROM shared)),
       |isl AS (SELECT doc_id,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM hits),
       |runs AS (SELECT doc_id, grp, count(*) AS len FROM isl GROUP BY 1, 2)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |  CAST(max(len) AS BIGINT) AS max_span,
       |  CAST(sum(len) AS BIGINT) AS n_dup_pos
       |FROM runs GROUP BY doc_id""".stripMargin

  /** Per-document shingle NOVELTY: the fraction of a doc's distinct
    * word-3-gram shingles whose globally FIRST occurrence (min doc_id over
    * the corpus) is this document. Low novelty = the doc's content is
    * mostly restatement of earlier documents — the cross-document
    * complement to [[repetition]] (which is within-document), used to
    * down-weight late near-copies during curation.
    *
    * Fixed-point output (novelty_fp = (Scale·n_novel) div n_shingles) so
    * the engines hash-match. Shingles move as the shared portable int64
    * hash ([[Hashing.md5Long]]) — a collision merges the same two shingles
    * in both engines, so parity is unaffected. Shape: one shuffle on the
    * shingle hash for the min-doc aggregation, one shingle-keyed join back
    * (both bounded by |distinct shingles|), one doc_id aggregation. */
  def novelty(spark: SparkSession, sfDir: String): DataFrame = {
    val hs = Dedup.shingles(spark, sfDir)
      .select(col("doc_id"), Hashing.md5Long(col("shingle")).as("h"))
    val first = hs.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
    hs.join(first, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        expr(s"(${Ranking.Scale} * n_novel) div n_shingles").as("novelty_fp"))
  }

  def noveltySql: String =
    s"""WITH ${Dedup.shinglesSql(3)},
       |hs AS (SELECT doc_id, ${Hashing.md5LongSql("shingle")} AS h FROM sh),
       |first AS (SELECT h, min(doc_id) AS first_doc FROM hs GROUP BY 1)
       |SELECT hs.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(sum(CASE WHEN f.first_doc = hs.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |  CAST((${Ranking.Scale} * sum(CASE WHEN f.first_doc = hs.doc_id THEN 1 ELSE 0 END))
       |    // count(*) AS BIGINT) AS novelty_fp
       |FROM hs JOIN first f ON hs.h = f.h
       |GROUP BY hs.doc_id""".stripMargin

  /** Gopher-style repetition signals over word bigrams: the fraction of the
    * document covered by its single most frequent bigram, and the fraction of
    * bigram occurrences that are repeats (1 − distinct/total). High values
    * flag boilerplate / template spam for the quality gate. Docs need ≥ 2
    * tokens to have a bigram. */
  def repetition(spark: SparkSession, sfDir: String): DataFrame =
    repetitionOfDocs(Tables.documents(spark, sfDir))

  def repetitionOfDocs(docs: DataFrame): DataFrame =
    repetitionOfTokenized(docs.select(col("doc_id"), TextOps.tokens(col("text")).as("t")))

  /** Core of [[repetition]] over a pre-tokenized (doc_id, t) frame. */
  def repetitionOfTokenized(d: DataFrame): DataFrame =
    d
      .select(col("doc_id"), col("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(graft.functions.ShinglesExpression.word_shingles(col("t"), 2)).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        max(col("cnt")).as("top_cnt"),
        count(lit(1)).as("n_distinct"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("top_cnt").cast("double") / col("n_bigrams").cast("double"), 6)
          .as("top_bigram_frac"),
        round((col("n_bigrams") - col("n_distinct")).cast("double")
          / col("n_bigrams").cast("double"), 6).as("dup_bigram_frac"))

  val repetitionSql: String =
    s"""WITH toks AS (SELECT doc_id, ${TextOps.tokensSql} AS t FROM documents),
       |bg AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS b
       |       FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
       |       WHERE len(t) >= 2),
       |c AS (SELECT doc_id, b, count(*) AS cnt FROM bg GROUP BY 1, 2)
       |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
       |  round(CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6) AS top_bigram_frac,
       |  round(CAST(sum(cnt) - count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6) AS dup_bigram_frac
       |FROM c GROUP BY doc_id""".stripMargin

  /** Winnowing parameters (Schleimer, Wilkerson, Aiken — SIGMOD'03, the MOSS
    * algorithm): hash every word [[WinnowK]]-gram in POSITION order, then
    * keep the minimum hash of each sliding window of [[WinnowW]] consecutive
    * k-gram hashes. Guarantees: any shared run of ≥ K+W−1 tokens between two
    * documents yields a shared fingerprint, with ~2/(W+1) of the hashes kept. */
  val WinnowK = 3
  val WinnowW = 4

  /** Winnowing document fingerprints: (doc_id, fp) where fp is a selected
    * k-gram hash. Unlike the MinHash *signature* (fixed-width, whole-doc
    * similarity), winnowing fingerprints localize MATCHING SUBSTRINGS — the
    * shape used for plagiarism / partial-overlap detection and for
    * train-test overlap audits of long documents.
    *
    * The whole selection runs inside per-row array lambdas — hash list,
    * sliding-window minima, distinct — so the operator is a zero-shuffle
    * narrow map; an inverted index on fp (one groupBy away) is how the
    * pairwise audit runs at scale, with join fan-out bounded per fingerprint
    * exactly like the LSH band buckets. Short docs (fewer than W windows)
    * keep the min of what they have — never zero fingerprints. */
  def winnow(spark: SparkSession, sfDir: String): DataFrame =
    winnowOfDocs(Tables.documents(spark, sfDir))

  def winnowOfDocs(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= WinnowK)
      .select(col("doc_id"), explode(
        graft.functions.WinnowExpression.winnow_fps(col("t"), WinnowK, WinnowW)).as("fp"))

  val winnowSql: String = {
    val kgram = (0 until WinnowK).map(k => s"t[i + $k]").mkString(" || ' ' || ")
    s"""WITH toks AS (SELECT doc_id, ${TextOps.tokensSql} AS t FROM documents),
       |hs AS (SELECT doc_id, list_transform(generate_series(1, len(t) - ${WinnowK - 1}),
       |         i -> ${Hashing.md5LongSql(s"($kgram)")}) AS h
       |       FROM toks WHERE len(t) >= $WinnowK)
       |SELECT doc_id, unnest(list_distinct(list_transform(
       |         generate_series(1, greatest(len(h) - ${WinnowW - 1}, 1)),
       |         i -> list_min(h[i:i + ${WinnowW - 1}])))) AS fp
       |FROM hs""".stripMargin
  }

  /** Hot-fingerprint cap for [[winnowPairs]]: fingerprints shared by more
    * documents than this are boilerplate (license headers, templates), and
    * their buckets would expand quadratically — production n-gram-overlap
    * systems drop them exactly like stop-words. Far above any df in the
    * test corpora, so the oracle is unaffected; at 100 TB it is the bound
    * that keeps every bucket's pair expansion constant-size. */
  val WinnowMaxDf = 1000

  /** Partial-overlap audit: document pairs sharing ≥ `minShared` winnowing
    * fingerprints — the inverted-index companion to [[winnow]] that turns
    * localized fingerprints into "these two docs share actual token runs"
    * evidence (train/test overlap auditing, clone detection).
    *
    * Same bucket discipline as the LSH paths: fingerprints are the ONLY
    * join key, buckets above [[WinnowMaxDf]] are dropped before any pair
    * materializes, and pairs expand inside each bucket — shuffle is one
    * pass of the fingerprint table, never doc². */
  def winnowPairs(spark: SparkSession, sfDir: String, minShared: Int = 2): DataFrame =
    winnowPairsOfDocs(Tables.documents(spark, sfDir), minShared)

  def winnowPairsOfDocs(docs: DataFrame, minShared: Int = 2): DataFrame =
    BucketPairs.expand(
      winnowOfDocs(docs)
        .groupBy(col("fp"))
        .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1 && size(col("ids")) <= WinnowMaxDf),
      "doc_a", "doc_b")
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)

  def winnowPairsSql(minShared: Int = 2): String =
    s"""WITH fpt AS ($winnowSql),
       |df AS (SELECT fp, count(*) AS c FROM fpt GROUP BY 1),
       |keep AS (SELECT fpt.doc_id, fpt.fp FROM fpt JOIN df USING (fp)
       |         WHERE c > 1 AND c <= $WinnowMaxDf)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
       |FROM keep a JOIN keep b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= $minShared""".stripMargin

  /** PII patterns: RFC-5322-ish emails and digit runs long enough to be
    * phone numbers / account ids. Both stay inside the regex subset that
    * Java's engine and DuckDB's RE2 interpret identically (character
    * classes, bounded repetition — no backrefs, no lookaround). */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val NumberRe = "[0-9]{7,}"

  /** PII redaction: count and mask emails, then count and mask long digit
    * runs in the email-masked text (ordering matters — digits inside an
    * email are the email's, not a phone number). Emits match counts plus the
    * md5 of the redacted text, so the oracle verifies the exact redacted
    * bytes without shipping full text through the compare. Pure codegen'd
    * map — at 100 TB this is a scan-speed pass, and the same expression
    * drops into [[graft.streaming.StreamingOps]] sources unchanged for
    * redact-on-ingest. */
  def piiRedact(spark: SparkSession, sfDir: String): DataFrame =
    piiRedactOfDocs(Tables.documents(spark, sfDir))

  def piiRedactOfDocs(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
        regexp_replace(col("text"), EmailRe, "<EMAIL>").as("t1"))
      .select(col("doc_id"), col("n_emails"),
        size(regexp_extract_all(col("t1"), lit(NumberRe), lit(0))).cast("long").as("n_numbers"),
        md5(regexp_replace(col("t1"), NumberRe, "<NUM>")).as("clean_hash"))

  val piiRedactSql: String =
    s"""WITH r1 AS (SELECT doc_id,
       |    len(regexp_extract_all(text, '$EmailRe')) AS n_emails,
       |    regexp_replace(text, '$EmailRe', '<EMAIL>', 'g') AS t1
       |  FROM documents)
       |SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(t1, '$NumberRe')) AS BIGINT) AS n_numbers,
       |  md5(regexp_replace(t1, '$NumberRe', '<NUM>', 'g')) AS clean_hash
       |FROM r1""".stripMargin

  /** Chunking geometry: [[ChunkTokens]]-token windows every
    * [[ChunkStride]] tokens (16-token overlap) — the RAG / long-context
    * training prep that turns documents into model-sized pieces without
    * losing cross-boundary context. */
  val ChunkTokens = 64
  val ChunkStride = 48

  /** Split every document into overlapping fixed-token CHUNKS: one output
    * row per (doc, chunk) with its token offset, length, and an md5 content
    * fingerprint (the id an embedding/index stage would key on). A chunk
    * starts at every stride multiple below the token count, so adjacent
    * chunks share `ChunkTokens − ChunkStride` tokens and the tail is kept
    * short rather than dropped.
    *
    * Pure per-document map — sequence/slice/hash inside the scan stage,
    * ZERO shuffle: at 100 TB chunking runs at scan speed like the quality
    * gates, and the output feeds straight into the embedding/pack stages. */
  def chunkDocs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .select(col("doc_id"), col("t"), size(col("t")).as("len"),
        explode(expr(s"sequence(0, (size(t) + $ChunkStride - 1) div $ChunkStride - 1)"))
          .as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        (col("chunk_id") * ChunkStride).cast("long").as("start_tok"),
        least(lit(ChunkTokens), col("len") - col("chunk_id") * ChunkStride)
          .cast("long").as("n_toks"),
        md5(concat_ws(" ",
          slice(col("t"), col("chunk_id") * ChunkStride + 1,
            least(lit(ChunkTokens), col("len") - col("chunk_id") * ChunkStride))))
          .as("chunk_hash"))

  val chunkDocsSql: String =
    s"""WITH toks AS (SELECT doc_id, ${TextOps.tokensSql} AS t FROM documents),
       |c AS (SELECT doc_id, t, len(t) AS l, g.c AS chunk_id
       |  FROM toks, LATERAL (SELECT unnest(generate_series(
       |    0, (len(t) + $ChunkStride - 1) // $ChunkStride - 1)) AS c) g
       |  WHERE len(t) >= 1)
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |  CAST(chunk_id * $ChunkStride AS BIGINT) AS start_tok,
       |  CAST(least($ChunkTokens, l - chunk_id * $ChunkStride) AS BIGINT) AS n_toks,
       |  md5(array_to_string(t[(chunk_id * $ChunkStride + 1):
       |    (chunk_id * $ChunkStride + least($ChunkTokens, l - chunk_id * $ChunkStride))],
       |    ' ')) AS chunk_hash
       |FROM c""".stripMargin

  /** Fixed-point scale for [[lmScore]]'s smoothed transition probabilities
    * (9 decimal digits; `LmScale·(c2+1)` stays far inside int64 for any
    * realistic bigram count). */
  val LmScale = 1000000000L

  /** Statistical language-model quality score (the CCNet / Gopher
    * "perplexity filtering" stage): train an add-one-smoothed bigram model
    * ON the corpus itself, then score every document by its mean smoothed
    * transition likelihood
    * `mean over doc bigrams of (C(w1,w2)+1) / (C(w1)+V)`. Documents of
    * improbable token transitions (boilerplate, mojibake, keyword stuffing)
    * score low. Deliberate variant: the ARITHMETIC mean of probabilities
    * replaces the geometric/log mean of true perplexity — log needs
    * transcendental floats that never hash-match across engines, while this
    * form is all-int64 (`p_fp = (LmScale·(C2+1)) div (C1+V)`, positive
    * operands so trunc-div ≡ floor-div in both engines) and still orders
    * junk below fluent text.
    *
    * Scale shape: training = two aggregations bounded by |distinct bigrams|
    * and |vocab| (never token volume after the partial agg); the model
    * joins back to per-doc bigram counts ON THE BIGRAM KEY — the corpus is
    * re-shuffled only by its distinct-bigram projection, and the vocab
    * size reaches every row as a broadcast 1-row aggregate. At 100 TB the
    * model tables are the shuffle, the text is not. */
  def lmScore(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
    val occ = toks.filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(graft.functions.ShinglesExpression.word_shingles(col("t"), 2)).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("cnt"))
      // model training AND doc scoring both read occ: materialize once
      // instead of re-running tokenize+shingle+aggregate per consumer
      .localCheckpoint()
    // |vocab| rows; read by the model join AND the vocab-size aggregate
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
      .localCheckpoint()
    val vocab = uni.agg(count(lit(1)).as("v"))
    val model = occ.groupBy(col("b")).agg(sum(col("cnt")).as("c2"))
      .withColumn("w1", split(col("b"), " ").getItem(0))
      .join(uni, col("w1") === col("w"))
      .crossJoin(broadcast(vocab))
      .select(col("b"), expr(s"($LmScale * (c2 + 1)) div (c1 + v)").as("p_fp"))
    occ.join(model, "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"), sum(col("cnt") * col("p_fp")).as("psum"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("psum div n_bigrams").as("lm_score_fp"))
  }

  val lmScoreSql: String =
    s"""WITH toks AS (SELECT doc_id, ${TextOps.tokensSql} AS t FROM documents),
       |occ AS (SELECT doc_id, b, count(*) AS cnt FROM (
       |    SELECT doc_id, t[i] || ' ' || t[i + 1] AS b
       |    FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
       |    WHERE len(t) >= 2) GROUP BY 1, 2),
       |uni AS (SELECT w, count(*) AS c1
       |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
       |v AS (SELECT count(*) AS v FROM uni),
       |model AS (SELECT g.b, ($LmScale * (c2 + 1)) // (c1 + v.v) AS p_fp
       |  FROM (SELECT b, sum(cnt) AS c2 FROM occ GROUP BY 1) g
       |  JOIN uni ON split_part(g.b, ' ', 1) = uni.w
       |  CROSS JOIN v)
       |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
       |  CAST(sum(cnt * p_fp) // sum(cnt) AS BIGINT) AS lm_score_fp
       |FROM occ JOIN model USING (b) GROUP BY doc_id""".stripMargin

  /** CCNet-style HEAD/MIDDLE/TAIL perplexity bucketing (Wenzek et al.,
    * LREC 2020): per language, documents rank by the [[lmScore]] fluency
    * score and split into equal terciles — head = most fluent (CCNet keeps
    * it outright), middle = kept-with-caution, tail = usually dropped.
    * Output is the per-(lang, bucket) data card — doc count, bigram
    * volume, and the score boundaries a serving pipeline needs to apply
    * the SAME split to new data without re-ranking the corpus.
    *
    * Portability: ntile is ANSI (first `n mod 3` groups take the extra
    * row) over a (score desc, doc_id) order whose key is the all-int64
    * [[lmScore]] fixed point — no floats anywhere. Scale shape: the frame
    * entering the per-lang window is THREE integers per document (id,
    * bigram count, score), never text — the same |docs|-bounded metadata
    * sort as shard_assign's global permutation; everything upstream is
    * lmScore's vocab-bounded model shuffles. */
  def ccnetBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("lm_score_fp").desc, col("doc_id").asc)
    lmScore(spark, sfDir)
      .join(Tables.documents(spark, sfDir).select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("b", ntile(3).over(w))
      .groupBy(col("lang"),
        expr("CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END").as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bigrams")).as("total_bigrams"),
        min(col("lm_score_fp")).as("min_score_fp"),
        max(col("lm_score_fp")).as("max_score_fp"))
  }

  val ccnetBucketsSql: String =
    s"""WITH scored AS (${lmScoreSql.replace("\n", "\n  ")}),
       |j AS (SELECT s.doc_id, d.lang, s.n_bigrams, s.lm_score_fp
       |  FROM scored s JOIN documents d USING (doc_id)),
       |t AS (SELECT lang, n_bigrams, lm_score_fp,
       |    ntile(3) OVER (PARTITION BY lang
       |      ORDER BY lm_score_fp DESC, doc_id ASC) AS b
       |  FROM j)
       |SELECT lang,
       |  CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_bigrams) AS BIGINT) AS total_bigrams,
       |  min(lm_score_fp) AS min_score_fp,
       |  max(lm_score_fp) AS max_score_fp
       |FROM t GROUP BY 1, 2""".stripMargin

  /** Per-document triangle participation in the winnow partial-overlap
    * graph — the clustering-coefficient building block: a doc in many
    * triangles sits inside a mutually-overlapping template family (every
    * pairwise overlap present), where a pairwise match alone can be a
    * one-off shared passage.
    *
    * Algorithm: edge orientation by the total order (degree, id) — each
    * edge points from its lower to its higher endpoint in that order, each
    * triangle is then enumerated EXACTLY once from its minimum vertex
    * (wedge join on the shared source + one closing-edge membership join;
    * Suri–Vassilvitskii's MapReduce formulation). The wedge fan-out per
    * node is its OUT-degree in the orientation, bounded by O(sqrt(|E|))
    * on any graph (arboricity bound) — the skew-proof property that makes
    * this the 100 TB shape, where the naive wedge join on raw degree
    * explodes on hub nodes. All joins are equi-joins on node/edge keys. */
  def graphTriangles(spark: SparkSession, sfDir: String): DataFrame =
    trianglesOfPairs(winnowPairs(spark, sfDir))

  private[graft] def trianglesOfPairs(pairs: DataFrame,
                                      materializeShared: Boolean = true): DataFrame = {
    // Canonical undirected edges (a < b), consumed by the orientation AND
    // the closing-edge join → materialize once. `materializeShared = false`
    // when the caller already checkpointed the pair list (a rename over
    // materialized blocks is free; a second checkpoint would store the
    // edge set twice — see clusteringCoeffOfPairs).
    val renamed = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
    val e = if (materializeShared) renamed.localCheckpoint() else renamed
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val aLower = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(aLower, col("a")).otherwise(col("b")).as("src"),
        when(aLower, col("b")).otherwise(col("a")).as("dst"))
      .localCheckpoint() // both sides of the wedge self-join
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("apex"), col("e1.dst").as("w1"), col("e2.dst").as("w2"))
    val tri = wedges.join(e,
        least(col("w1"), col("w2")) === col("a") &&
          greatest(col("w1"), col("w2")) === col("b"))
      .select(col("apex"), col("w1"), col("w2"))
    tri.select(explode(array(col("apex"), col("w1"), col("w2"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Naive one-direction triangle enumeration as CTE text over a
    * `pairs(doc_a, doc_b)` CTE, ending in `tc(doc_id, t)` = per-node
    * triangle counts — e1=(x,y), e2=(y,z), closing (x,z); x<y<z makes each
    * triangle appear exactly once. ONE definition shared by
    * [[graphTrianglesSql]] and [[clusteringCoeffSql]] so the enumeration
    * cannot silently diverge between the two oracles. */
  private def triCountCtes: String =
    s"""e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
       |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |  FROM e e1 JOIN e e2 ON e2.a = e1.b
       |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
       |tc AS (SELECT doc_id, count(*) AS t FROM (SELECT x AS doc_id FROM tri
       |  UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri) GROUP BY 1)""".stripMargin

  val graphTrianglesSql: String =
    s"""WITH pairs AS (${winnowPairsSql()}),
       |$triCountCtes
       |SELECT doc_id, CAST(t AS BIGINT) AS n_triangles FROM tc""".stripMargin

  /** Fixed-point scale for [[clusteringCoeff]] (6 decimal digits is plenty
    * for a [0,1] ratio; 2·t·10^6 stays far inside int64). */
  val CoeffScale = 1000000L

  /** Local clustering coefficient over the winnow overlap graph:
    * `c(v) = 2·triangles(v) / (deg(v)·(deg(v)−1))` for nodes of degree ≥ 2,
    * in fixed point — THE standard cohesion metric on top of
    * [[graphTriangles]]: ~[[CoeffScale]] means v's overlap partners all
    * overlap each other (a template clique); ~0 means v is a hub joining
    * documents that share nothing with one another (scattered one-off
    * matches). Plan adds one degree aggregation and one left join to the
    * triangle plan — still equi-joins bounded by |E|. */
  def clusteringCoeff(spark: SparkSession, sfDir: String): DataFrame =
    clusteringCoeffOfPairs(winnowPairs(spark, sfDir))

  private[graft] def clusteringCoeffOfPairs(rawPairs: DataFrame): DataFrame = {
    val pairs = rawPairs
      .select(col("doc_a"), col("doc_b")).localCheckpoint() // degrees + triangles
    val deg = pairs.select(col("doc_a").as("doc_id"))
      .unionAll(pairs.select(col("doc_b").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
    val tri = trianglesOfPairs(pairs, materializeShared = false)
    deg.filter(col("degree") >= 2)
      .join(tri, Seq("doc_id"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .select(col("doc_id"), col("degree"), col("n_triangles"),
        expr(s"(2 * n_triangles * $CoeffScale) div (degree * (degree - 1))")
          .as("coeff_fp"))
  }

  val clusteringCoeffSql: String =
    s"""WITH pairs AS (${winnowPairsSql()}),
       |$triCountCtes,
       |deg AS (SELECT doc_id, count(*) AS degree FROM (
       |    SELECT a AS doc_id FROM e UNION ALL SELECT b FROM e) GROUP BY 1)
       |SELECT d.doc_id, CAST(d.degree AS BIGINT) AS degree,
       |  CAST(coalesce(tc.t, 0) AS BIGINT) AS n_triangles,
       |  CAST((2 * coalesce(tc.t, 0) * $CoeffScale)
       |    // (d.degree * (d.degree - 1)) AS BIGINT) AS coeff_fp
       |FROM deg d LEFT JOIN tc USING (doc_id) WHERE d.degree >= 2""".stripMargin

  /** Eval share: doc lands in eval iff md5(id) % 10 == 0 (~10%). */
  val SplitEvalMod = 10L

  /** LEAKAGE-SAFE TRAIN/EVAL SPLIT — the reason a pipeline dedups BEFORE
    * splitting (Lee et al. 2022's motivation: near-duplicate train/test
    * leakage silently inflates eval scores): a naive per-document hash
    * split routes the two halves of a near-dup pair independently, so
    * ~2·p·(1−p) of pairs straddle the boundary and the eval set contains
    * soft copies of training documents. The fix is splitting by DEDUP
    * CLUSTER: every member of a near-dup component inherits the
    * component's hash, so no pair can straddle — leakage is zero BY
    * CONSTRUCTION, and this operator measures both strategies side by
    * side (the quantified argument for the extra CC pass). One row per
    * strategy: train/eval doc counts and the cross-split near-dup pair
    * count.
    *
    * Scale shape: the LSH pair graph and CC loop are the registered
    * [[Dedup.clusters]] machinery (edge-bounded shuffles); split flags
    * are a hash map; leak counting joins the (bounded) pair set against
    * the checkpointed assignment twice — never corpus×corpus. */
  def splitLeakage(spark: SparkSession, sfDir: String): DataFrame =
    splitLeakageOf(Tables.documents(spark, sfDir).select(col("doc_id")),
      Dedup.minhashLsh(spark, sfDir))

  /** Core of [[splitLeakage]] over any doc-id frame + near-dup pair set. */
  private[graft] def splitLeakageOf(docs: DataFrame, pairs0: DataFrame): DataFrame = {
    val pairs = pairs0.localCheckpoint() // CC loop + both leak joins read it
    val comp = Dedup.clustersOfPairs(pairs)
    val assign = docs
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cid", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("naive_eval",
        Hashing.md5Long(col("doc_id").cast("string")) % SplitEvalMod === 0)
      .withColumn("cluster_eval",
        Hashing.md5Long(col("cid").cast("string")) % SplitEvalMod === 0)
      .localCheckpoint() // counts + two leak joins read it
    def strat(name: String, flag: String): DataFrame = {
      val counts = assign.agg(
        sum(when(!col(flag), 1L).otherwise(0L)).as("n_train"),
        sum(when(col(flag), 1L).otherwise(0L)).as("n_eval"))
      val leaks = pairs
        .join(assign.select(col("doc_id").as("doc_a"), col(flag).as("ea")), Seq("doc_a"))
        .join(assign.select(col("doc_id").as("doc_b"), col(flag).as("eb")), Seq("doc_b"))
        .agg(coalesce(sum(when(col("ea") =!= col("eb"), 1L).otherwise(0L)), lit(0L))
          .as("leaked_pairs"))
      counts.crossJoin(broadcast(leaks))
        .select(lit(name).as("strategy"), col("n_train"), col("n_eval"),
          col("leaked_pairs"))
    }
    strat("doc_hash", "naive_eval")
      .unionByName(strat("cluster_hash", "cluster_eval"))
  }

  /** DuckDB twin — the recursive-CC cluster CTEs, the same hash splits,
    * the same leak counts. */
  def splitLeakageSql: String = {
    def flags(idExpr: String) =
      s"${Hashing.md5LongSql(s"CAST($idExpr AS VARCHAR)")} % $SplitEvalMod = 0"
    s"""WITH RECURSIVE ${Dedup.clusterCtes},
       |assign AS (
       |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cid
       |  FROM documents d LEFT JOIN comp c USING (doc_id)),
       |fl AS (SELECT doc_id, ${flags("doc_id")} AS naive_eval,
       |    ${flags("cid")} AS cluster_eval
       |  FROM assign),
       |naive_leak AS (SELECT count(*) AS lk FROM pairs p
       |  JOIN fl a ON p.doc_a = a.doc_id JOIN fl b ON p.doc_b = b.doc_id
       |  WHERE a.naive_eval <> b.naive_eval),
       |cluster_leak AS (SELECT count(*) AS lk FROM pairs p
       |  JOIN fl a ON p.doc_a = a.doc_id JOIN fl b ON p.doc_b = b.doc_id
       |  WHERE a.cluster_eval <> b.cluster_eval)
       |SELECT 'doc_hash' AS strategy,
       |  CAST(sum(CASE WHEN naive_eval THEN 0 ELSE 1 END) AS BIGINT) AS n_train,
       |  CAST(sum(CASE WHEN naive_eval THEN 1 ELSE 0 END) AS BIGINT) AS n_eval,
       |  (SELECT CAST(lk AS BIGINT) FROM naive_leak) AS leaked_pairs
       |FROM fl
       |UNION ALL
       |SELECT 'cluster_hash',
       |  CAST(sum(CASE WHEN cluster_eval THEN 0 ELSE 1 END) AS BIGINT),
       |  CAST(sum(CASE WHEN cluster_eval THEN 1 ELSE 0 END) AS BIGINT),
       |  (SELECT CAST(lk AS BIGINT) FROM cluster_leak)
       |FROM fl""".stripMargin
  }

  // ---- snapshot diff (dataset release notes) -------------------------------

  /** SNAPSHOT DIFF CARD — the release-engineering step between two corpus
    * versions: per (source, op) the document counts and character volume a
    * dataset changelog publishes before a version bump ships to training
    * (what a Delta/Iceberg table-diff or a crawl re-snapshot review reads).
    * Ops: `added` (new docs), `removed`, `changed` (same doc_id, different
    * content fingerprint), `unchanged`.
    *
    * The two versions derive deterministically from the one documents
    * table so the oracle can re-derive them (the [[Relational.snapshotMerge]]
    * side-derivation precedent): v1 lacks doc_id ≡ 3 (mod 7) (added later)
    * and carries a half-truncated re-crawl text for doc_id ≡ 2 (mod 5)
    * (changed later); v2 lacks doc_id ≡ 4 (mod 11) (removed).
    *
    * Scale shape: each side projects to (doc_id, source, fingerprint,
    * chars) BEFORE the join — the diff moves four narrow columns per doc,
    * NEVER text (the fingerprint is the repo-wide portable 56-bit md5) —
    * then ONE key-bounded full-outer join on doc_id and a |sources|×4
    * rollup. At 100 TB both sides would additionally be bucket-co-located
    * on doc_id, making the diff shuffle-free. */
  def corpusDiff(spark: SparkSession, sfDir: String): DataFrame =
    corpusDiffOf(Tables.documents(spark, sfDir))

  /** Core of [[corpusDiff]] over any (doc_id, source, text) frame. */
  private[graft] def corpusDiffOf(docs: DataFrame): DataFrame = {
    def side(df: DataFrame) = df.select(col("doc_id"), col("source"),
      Hashing.md5Long(col("text")).as("h"), length(col("text")).cast("long").as("chars"))
    val v1 = side(docs.filter(col("doc_id") % 7 =!= 3)
      .withColumn("text", when(col("doc_id") % 5 === 2,
          expr("substring(text, 1, length(text) div 2)")).otherwise(col("text"))))
    val v2 = side(docs.filter(col("doc_id") % 11 =!= 4))
    v1.as("a").join(v2.as("b"), col("a.doc_id") === col("b.doc_id"), "full_outer")
      .select(
        coalesce(col("b.source"), col("a.source")).as("source"),
        when(col("a.doc_id").isNull, "added")
          .when(col("b.doc_id").isNull, "removed")
          .when(col("a.h") =!= col("b.h"), "changed")
          .otherwise("unchanged").as("op"),
        coalesce(col("a.chars"), lit(0L)).as("c1"),
        coalesce(col("b.chars"), lit(0L)).as("c2"))
      .groupBy(col("source"), col("op"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("c1")).as("chars_old"),
        sum(col("c2")).as("chars_new"))
      .withColumn("chars_delta", col("chars_new") - col("chars_old"))
  }

  /** DuckDB twin — same version derivations, same fingerprint compare. */
  val corpusDiffSql: String =
    s"""WITH v1r AS (SELECT doc_id, source,
       |    CASE WHEN doc_id % 5 = 2 THEN substr(text, 1, length(text) // 2)
       |         ELSE text END AS text
       |  FROM documents WHERE doc_id % 7 <> 3),
       |v1 AS (SELECT doc_id, source, ${Hashing.md5LongSql("text")} AS h,
       |    CAST(length(text) AS BIGINT) AS chars
       |  FROM v1r),
       |v2 AS (SELECT doc_id, source, ${Hashing.md5LongSql("text")} AS h,
       |    CAST(length(text) AS BIGINT) AS chars
       |  FROM documents WHERE doc_id % 11 <> 4),
       |j AS (SELECT coalesce(b.source, a.source) AS source,
       |    CASE WHEN a.doc_id IS NULL THEN 'added'
       |         WHEN b.doc_id IS NULL THEN 'removed'
       |         WHEN a.h <> b.h THEN 'changed'
       |         ELSE 'unchanged' END AS op,
       |    coalesce(a.chars, 0) AS c1, coalesce(b.chars, 0) AS c2
       |  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
       |SELECT source, op, count(*) AS n_docs,
       |  CAST(sum(c1) AS BIGINT) AS chars_old, CAST(sum(c2) AS BIGINT) AS chars_new,
       |  CAST(sum(c2) - sum(c1) AS BIGINT) AS chars_delta
       |FROM j GROUP BY 1, 2""".stripMargin

  /** THE ATTRITION FUNNEL — the per-gate drop accounting every published
    * curation pipeline reports (RefinedWeb Table 2, Gopher A1.1, the C4
    * paper's filter cascade): one row per stage of the
    * [[graft.operators.Sampling.trainingMixFull]] gate chain (raw →
    * quality → repetition → contamination → near-dup), carrying survivors,
    * docs dropped AT that stage, surviving token volume, and the ppm
    * survival rate. Each document is attributed to its FIRST failing gate
    * — the number a pipeline owner needs to know which gate to retune —
    * and the gate ORDER and semantics are exactly the flagship's
    * (including its edge rule: a doc too short to produce bigrams or
    * shingles has no repetition/contamination row and drops AT that gate).
    *
    * Plan: the flagship's ONE checkpointed tokenize pass feeds all gates;
    * per-doc flags compose as doc_id LEFT joins; the funnel itself is ONE
    * aggregation row (conditional partials collapse map-side) unpivoted by
    * `stack` into 5 rows — adding the card to a pipeline costs no new
    * shuffle class at any corpus size. */
  def curationFunnel(spark: SparkSession, sfDir: String, minQuality: Double = 0.5,
      maxRep: Double = 0.1, maxContam: Double = 0.1): DataFrame = {
    val base = Checkpoints.ser(Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
      .withColumn("t", TextOps.tokens(col("text"))))
    val q = TextAnalysis.qualityOfTokenized(base)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val rep = repetitionOfTokenized(base).select(col("doc_id"), col("top_bigram_frac"))
    val sh = Checkpoints.ser(Dedup.shinglesOfTokenized(base))
    val contam = contaminationOfShingles(sh).select(col("doc_id"), col("contamination_frac"))
    val nonCanonical = Dedup.clustersOfPairs(Dedup.minhashLshStarOfShingles(sh))
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"), lit(1L).as("dup"))
    val flags = q
      .join(rep, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .join(nonCanonical, Seq("doc_id"), "left")
      // first failing stage; missing gate rows fail that gate (the
      // flagship's inner joins drop those docs at the same point)
      .withColumn("s",
        when(!coalesce(col("quality_score") >= minQuality, lit(false)), lit(1))
          .when(!coalesce(col("top_bigram_frac") <= maxRep, lit(false)), lit(2))
          .when(!coalesce(col("contamination_frac") <= maxContam, lit(false)), lit(3))
          .when(col("dup").isNotNull, lit(4))
          .otherwise(lit(5)))
    def cAt(k: Int) = sum(when(col("s") > k, 1L).otherwise(0L)).as(s"c$k")
    def tAt(k: Int) = sum(when(col("s") > k, col("n_tokens")).otherwise(0L)).as(s"t$k")
    flags
      .agg(count(lit(1)).as("c0"), sum(col("n_tokens")).as("t0"),
        cAt(1), tAt(1), cAt(2), tAt(2), cAt(3), tAt(3), cAt(4), tAt(4))
      .selectExpr(
        s"""stack(5,
           |  'raw',           0L, c0, t0, 0L,      1000000L,
           |  'quality',       1L, c1, t1, c0 - c1, (1000000 * c1) div greatest(c0, 1),
           |  'repetition',    2L, c2, t2, c1 - c2, (1000000 * c2) div greatest(c0, 1),
           |  'contamination', 3L, c3, t3, c2 - c3, (1000000 * c3) div greatest(c0, 1),
           |  'dedup',         4L, c4, t4, c3 - c4, (1000000 * c4) div greatest(c0, 1)
           |) AS (stage, stage_id, n_docs, n_tokens, dropped, survived_ppm)""".stripMargin)
  }

  /** DuckDB twin — the same first-failing-gate CASE over the gate CTEs'
    * own SQL texts (the [[contaminationVerdictSql]] lockstep discipline),
    * one aggregate row, unpivoted by UNION ALL. */
  def curationFunnelSql(minQuality: Double = 0.5, maxRep: Double = 0.1,
      maxContam: Double = 0.1): String =
    s"""WITH RECURSIVE ${Dedup.clusterCtes},
       |q AS (${TextAnalysis.qualitySql}),
       |rep AS (${repetitionSql}),
       |con AS (${contaminationSql}),
       |flags AS (
       |  SELECT q.doc_id, q.n_tokens,
       |    CASE WHEN NOT coalesce(q.quality_score >= $minQuality, FALSE) THEN 1
       |         WHEN NOT coalesce(rep.top_bigram_frac <= $maxRep, FALSE) THEN 2
       |         WHEN NOT coalesce(con.contamination_frac <= $maxContam, FALSE) THEN 3
       |         WHEN EXISTS (SELECT 1 FROM comp c
       |                      WHERE c.doc_id = q.doc_id AND c.doc_id <> c.cluster_id) THEN 4
       |         ELSE 5 END AS s
       |  FROM q LEFT JOIN rep ON q.doc_id = rep.doc_id
       |         LEFT JOIN con ON q.doc_id = con.doc_id),
       |f AS (SELECT CAST(count(*) AS BIGINT) AS c0, CAST(sum(n_tokens) AS BIGINT) AS t0,
       |    CAST(count(*) FILTER (WHERE s > 1) AS BIGINT) AS c1,
       |    CAST(coalesce(sum(n_tokens) FILTER (WHERE s > 1), 0) AS BIGINT) AS t1,
       |    CAST(count(*) FILTER (WHERE s > 2) AS BIGINT) AS c2,
       |    CAST(coalesce(sum(n_tokens) FILTER (WHERE s > 2), 0) AS BIGINT) AS t2,
       |    CAST(count(*) FILTER (WHERE s > 3) AS BIGINT) AS c3,
       |    CAST(coalesce(sum(n_tokens) FILTER (WHERE s > 3), 0) AS BIGINT) AS t3,
       |    CAST(count(*) FILTER (WHERE s > 4) AS BIGINT) AS c4,
       |    CAST(coalesce(sum(n_tokens) FILTER (WHERE s > 4), 0) AS BIGINT) AS t4
       |  FROM flags)
       |SELECT 'raw' AS stage, CAST(0 AS BIGINT) AS stage_id, c0 AS n_docs, t0 AS n_tokens,
       |  CAST(0 AS BIGINT) AS dropped, CAST(1000000 AS BIGINT) AS survived_ppm FROM f
       |UNION ALL SELECT 'quality', 1, c1, t1, c0 - c1,
       |  (1000000 * c1) // greatest(c0, 1) FROM f
       |UNION ALL SELECT 'repetition', 2, c2, t2, c1 - c2,
       |  (1000000 * c2) // greatest(c0, 1) FROM f
       |UNION ALL SELECT 'contamination', 3, c3, t3, c2 - c3,
       |  (1000000 * c3) // greatest(c0, 1) FROM f
       |UNION ALL SELECT 'dedup', 4, c4, t4, c3 - c4,
       |  (1000000 * c4) // greatest(c0, 1) FROM f""".stripMargin
}
