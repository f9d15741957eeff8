package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Term-weighting / retrieval scoring over `documents` — the ranking side
  * of a data pipeline (keyword extraction for corpus exploration, BM25
  * retrieval for contamination auditing and eval-set mining).
  *
  * Cross-engine discipline: every score is FIXED-POINT int64 — the idf and
  * length-normalization ratios are computed with integer multiply +
  * floor-division (Spark `div` ≡ DuckDB `//` on non-negative operands)
  * instead of `ln`/double division, because libm doubles do not hash-match
  * across engines (see operators/Exact.scala). DELIBERATE VARIANT: the idf
  * is linear (N/df), not logarithmic. Within one term the transform is
  * monotone, but across terms the missing log up-weights rare terms more
  * aggressively than log-idf, so multi-term rankings can differ from the
  * textbook TF-IDF/BM25 order — that trade (a rarity-heavier weighting
  * family, exactly portable arithmetic) is part of the operator's
  * contract, exactly like [[Curation.lmScore]]'s arithmetic-mean variant
  * of perplexity.
  */
object Ranking {

  /** Fixed-point scale for score ratios: 1e6 ≈ 20 bits of fraction.
    * Headroom: contributions stay < 2^60 for corpora up to ~10^7 docs; a
    * larger corpus shrinks the scale (one constant, both engines). */
  val Scale = 1000000L

  /** Per-document top-k terms by tf·idf with idf_fp = (N·Scale) div df —
    * linear idf (log omitted DELIBERATELY: see the object doc — rare terms
    * weigh more than under log-idf, and the score stays exactly portable).
    *
    * Shape: one (doc, term) aggregation with map-side partials; df derives
    * from the ALREADY-AGGREGATED tf rows (a vocabulary-sized shuffle, not
    * a token-stream one); N arrives as a broadcast 1-row aggregate; the
    * per-doc top-k compiles to WindowGroupLimit so each task keeps ≤k rows
    * per doc before the final exchange. No stage carries more than
    * |distinct (doc, term)| rows — the right 100 TB shape. */
  def tfIdfTopTerms(spark: SparkSession, sfDir: String, topK: Int = 3): DataFrame = {
    val occ = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
    val tf = occ.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // tf is distinct per (doc, term), so df = plain row count per term.
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = Tables.documents(spark, sfDir)
      .agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf_fp").desc, col("term").asc)
    tf.join(df, Seq("term"))
      .join(broadcast(nDocs))
      .withColumn("tfidf_fp", expr(s"tf * (($Scale * n_docs) div df)"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf_fp"), col("rnk"))
  }

  def tfIdfTopTermsSql(topK: Int = 3): String =
    s"""WITH occ AS (SELECT doc_id, unnest(${TextOps.tokensSql}) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM occ GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |    tf.tf * (($Scale * (SELECT n_docs FROM n)) // df.df) AS tfidf_fp
       |  FROM tf JOIN df ON tf.term = df.term)
       |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       |  CAST(tfidf_fp AS BIGINT) AS tfidf_fp, CAST(rnk AS BIGINT) AS rnk
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY doc_id ORDER BY tfidf_fp DESC, term) AS rnk
       |      FROM scored)
       |WHERE rnk <= $topK""".stripMargin

  /** The retrieval query the BM25 bench scores against — fixed so the
    * Spark plan and the oracle agree by construction. */
  val Bm25Query = Seq("spark", "hash", "merge")

  /** BM25 document ranking for [[Bm25Query]], k1 = 1.2, b = 0.75, top-20.
    *
    * Fixed-point form (Scale = 1e6, every op integer):
    * {{{ idf_fp   = ((2(N − df) + 1) · Scale) div (2·df + 1)        // (N−df+½)/(df+½) ×Scale
    *     denom_fp = tf·Scale + 0.3·Scale + (0.75·1.2·Scale · dl · N) div Σdl
    *     contrib  = (idf_fp · tf · 22 · 10^4) div denom_fp          // ×10 k1+1=2.2 }}}
    *
    * Shape: the token stream is filtered to the query's terms BEFORE any
    * shuffle — matched (doc, term, tf) rows are ~|query| · |matching
    * docs|, corpus stats (N, Σdl) are one broadcast 1-row aggregate, df
    * derives from the matched tf rows, and the final top-20 compiles to
    * TakeOrderedAndProject (no global sort). At 100 TB this is a scan +
    * three tiny aggregations. */
  def bm25Rank(spark: SparkSession, sfDir: String, topK: Int = 20): DataFrame = {
    val tokd = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) > 0)
    val dl = tokd.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = tokd
      .select(col("doc_id"), explode(col("t")).as("term"))
      .filter(col("term").isin(Bm25Query: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(df, Seq("term"))
      .join(dl, Seq("doc_id"))
      .join(broadcast(stats))
      .withColumn("idf_fp", expr(s"((2 * (n_docs - df) + 1) * $Scale) div (2 * df + 1)"))
      .withColumn("denom_fp",
        expr(s"tf * $Scale + 300000 + (900000 * dl * n_docs) div sum_dl"))
      .groupBy(col("doc_id"))
      .agg(sum(expr("(idf_fp * tf * 22 * 10000) div denom_fp")).cast("long").as("bm25_fp"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("bm25_fp").desc, col("doc_id").asc)
      .limit(topK)
  }

  def bm25RankSql(topK: Int = 20): String = {
    val terms = Bm25Query.map(t => s"'$t'").mkString(", ")
    s"""WITH tokd AS (SELECT doc_id, ${TextOps.tokensSql} AS t FROM documents),
       |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tokd WHERE len(t) > 0),
       |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
       |occ AS (SELECT doc_id, unnest(t) AS term FROM tokd),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM occ
       |       WHERE term IN ($terms) GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |contrib AS (
       |  SELECT tf.doc_id,
       |    ((2 * ((SELECT n_docs FROM stats) - df.df) + 1) * $Scale // (2 * df.df + 1)) AS idf_fp,
       |    tf.tf,
       |    (tf.tf * $Scale + 300000
       |      + (900000 * dl.dl * (SELECT n_docs FROM stats)) // (SELECT sum_dl FROM stats)) AS denom_fp
       |  FROM tf JOIN df ON tf.term = df.term JOIN dl ON tf.doc_id = dl.doc_id)
       |SELECT doc_id, CAST(sum((idf_fp * tf * 22 * 10000) // denom_fp) AS BIGINT) AS bm25_fp,
       |  CAST(count(*) AS BIGINT) AS n_terms
       |FROM contrib GROUP BY doc_id
       |ORDER BY bm25_fp DESC, doc_id LIMIT $topK""".stripMargin
  }

  /** Positional INVERTED-INDEX construction — the retrieval-index BUILD
    * step that [[bm25Rank]]'s scoring presupposes: per (term, doc) the
    * term frequency and the sorted token-position list (phrase/proximity
    * queries need positions, which is why production indexes store them),
    * df-capped as a FRACTION of the corpus (terms in more than
    * `dfCapNum/dfCapDen` of docs are boilerplate/stop-word postings a
    * ranked index drops — a fraction, not an absolute count, so the
    * policy means the same thing at every corpus size; the threshold
    * compares in exact integer cross-multiplication) and truncated to the
    * top `topK` postings per term by (tf desc, doc_id) — the
    * impact-ordered index layout WAND-style scorers scan.
    *
    * Shape: ONE shuffle on (term, doc_id) builds tf + positions with
    * map-side partials; df/rank share ONE further term-keyed exchange
    * (same partition key, both windows in one pass); the rank cap
    * compiles to WindowGroupLimit so no term ships more than topK+ rows;
    * the corpus count rides a 1-row broadcast. Positions serialize as a
    * comma-joined string — the driver compare stays on scalar columns.
    * Output is bounded by |vocab| × topK regardless of corpus size. */
  def invertedPostings(spark: SparkSession, sfDir: String,
      topK: Int = 10, dfCapNum: Int = 9, dfCapDen: Int = 10): DataFrame =
    invertedPostingsOf(Tables.documents(spark, sfDir), topK, dfCapNum, dfCapDen)

  /** Core over an explicit (doc_id, text) frame — the registered query
    * wraps the documents table; specs feed crafted corpora to pin the
    * boilerplate-drop behavior the synthetic table's tiny flat vocabulary
    * (31 terms, none above the cap) cannot exhibit. */
  def invertedPostingsOf(docs: DataFrame,
      topK: Int, dfCapNum: Int, dfCapDen: Int): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val occ = docs
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "term")))
    val postings = occ.groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"),
        array_join(transform(sort_array(collect_list(col("pos").cast("long"))),
          x => x.cast("string")), ",").as("positions"))
    val byTerm = Window.partitionBy(col("term"))
    val byImpact = byTerm.orderBy(col("tf").desc, col("doc_id").asc)
    postings
      .withColumn("df", count(lit(1)).over(byTerm))
      .withColumn("rank", row_number().over(byImpact))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * dfCapDen <= col("n_docs") * dfCapNum && col("rank") <= topK)
      .select(col("term"), col("doc_id"), col("tf"), col("positions"),
        col("df"), col("rank").cast("long").as("rank"))
  }

  /** SPARSE document-to-document similarity — the inverted-index twin of
    * the dense `knn_*` family: top [[DocSimTopK]] document pairs by exact
    * sparse tf-cosine, with candidates generated from IMPACT-ORDERED INDEX
    * PREFIXES (each term's top-[[DocSimPrefix]] postings by tf — the
    * WAND/JASS candidate-generation idea): two docs pair only if they
    * co-occur in some term's prefix, so candidate count is bounded by
    * |vocab| · R² at ANY corpus size — never the all-pairs N² a naive
    * sparse-similarity join degrades to. Exact cosine then scores only the
    * candidates: dot = Σ tf_a·tf_b over ALL shared terms (two |cand|-bounded
    * equi-joins back to the tf rows), reported as fixed-point
    * cos²·1e6 = dot²·1e6 div (‖a‖²·‖b‖²) — squaring dodges the
    * non-portable sqrt while preserving the ranking (cos ≥ 0 here since
    * tf ≥ 0). Magnitude: dot²·1e6 runs through 38-digit integer
    * arithmetic (Spark DECIMAL(38,0) IntegralDivide / DuckDB HUGEINT),
    * exact for docs up to ~56M tokens — int64 would wrap-in-Spark /
    * raise-in-DuckDB past ~1740 tokens, a divergent failure mode.
    *
    * Shape: ONE (doc, term) aggregation (map-side partials) feeds both the
    * prefix index (WindowGroupLimit keeps ≤ R rows/term before its
    * exchange) and the norm/dot joins; the prefix self-join shuffles on
    * `term` with both sides ≤ R rows/term; the final global top-k compiles
    * to TakeOrderedAndProject. 100 TB story: every stage is bounded by
    * |vocab|·R (index) or |candidates|·terms-per-doc (scoring) — corpus
    * size only enters through the first aggregation's scan. */
  def docSimSparse(spark: SparkSession, sfDir: String): DataFrame =
    docSimSparseOf(Tables.documents(spark, sfDir), DocSimPrefix, DocSimTopK)

  val DocSimPrefix = 16
  val DocSimTopK = 50

  /** Core over an explicit (doc_id, text) frame; specs feed crafted corpora
    * where the prefix truncation provably drops a pair a full index would
    * keep (the synthetic table's flat 31-term vocabulary exercises deep
    * postings but not adversarial prefix evictions). */
  def docSimSparseOf(docs: DataFrame, prefixR: Int, topK: Int): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint() // read 3×: prefix index, norms, both dot sides
    val norms = tf.groupBy(col("doc_id")).agg(sum(expr("tf * tf")).as("norm2"))
    val byImpact = Window.partitionBy(col("term"))
      .orderBy(col("tf").desc, col("doc_id").asc)
    val prefix = tf.withColumn("rnk", row_number().over(byImpact))
      .filter(col("rnk") <= prefixR)
      .select(col("term"), col("doc_id"))
    val cand = prefix.as("p1").join(prefix.as("p2"), Seq("term"))
      .filter(col("p1.doc_id") < col("p2.doc_id"))
      .select(col("p1.doc_id").as("a"), col("p2.doc_id").as("b"))
      .distinct()
    val dot = cand
      .join(tf.select(col("doc_id").as("a"), col("term"), col("tf").as("tfa")), Seq("a"))
      .join(tf.select(col("doc_id").as("b"), col("term"), col("tf").as("tfb")), Seq("b", "term"))
      .groupBy(col("a"), col("b")).agg(sum(expr("tfa * tfb")).as("dot"))
    dot
      .join(norms.select(col("doc_id").as("a"), col("norm2").as("na")), Seq("a"))
      .join(norms.select(col("doc_id").as("b"), col("norm2").as("nb")), Seq("b"))
      // dot²·1e6 through a DECIMAL(38,0) intermediate (DuckDB twin:
      // HUGEINT): the int64 spelling wrapped silently in Spark (non-ANSI)
      // but raised in DuckDB once docs passed ~1740 tokens — a DIVERGENT
      // failure mode on a drifted corpus. 38-digit integer arithmetic is
      // exact here (dot ≤ tokens², so dot²·1e6 < 1e38 up to ~56M-token
      // docs) and `div` on decimals is Spark's IntegralDivide — exact
      // floor, no decimal-division rounding in play; result ≤ 1e6 rides
      // back down to BIGINT.
      .withColumn("cos2_fp", expr(
        "CAST((CAST(dot AS DECIMAL(38,0)) * dot * 1000000) div (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"))
      .orderBy(col("cos2_fp").desc, col("a").asc, col("b").asc)
      .limit(topK)
      .select(col("a"), col("b"), col("dot"), col("na"), col("nb"), col("cos2_fp"))
  }

  def docSimSparseSql(prefixR: Int = DocSimPrefix, topK: Int = DocSimTopK): String =
    s"""WITH occ AS (SELECT doc_id, unnest(${TextOps.tokensSql}) AS term FROM documents),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM occ GROUP BY 1, 2),
       |norms AS (SELECT doc_id, sum(tf * tf) AS norm2 FROM tf GROUP BY 1),
       |prefix AS (SELECT term, doc_id FROM (
       |    SELECT term, doc_id, row_number() OVER (
       |      PARTITION BY term ORDER BY tf DESC, doc_id ASC) AS rnk FROM tf)
       |  WHERE rnk <= $prefixR),
       |cand AS (SELECT DISTINCT p1.doc_id AS a, p2.doc_id AS b
       |  FROM prefix p1 JOIN prefix p2 ON p1.term = p2.term AND p1.doc_id < p2.doc_id),
       |dot AS (SELECT c.a, c.b, sum(ta.tf * tb.tf) AS dot
       |  FROM cand c
       |  JOIN tf ta ON ta.doc_id = c.a
       |  JOIN tf tb ON tb.doc_id = c.b AND tb.term = ta.term
       |  GROUP BY c.a, c.b)
       |SELECT d.a, d.b, CAST(d.dot AS BIGINT) AS dot,
       |  CAST(na.norm2 AS BIGINT) AS na, CAST(nb.norm2 AS BIGINT) AS nb,
       |  CAST((CAST(d.dot AS HUGEINT) * d.dot * 1000000) // (CAST(na.norm2 AS HUGEINT) * nb.norm2) AS BIGINT) AS cos2_fp
       |FROM dot d
       |JOIN norms na ON na.doc_id = d.a
       |JOIN norms nb ON nb.doc_id = d.b
       |ORDER BY cos2_fp DESC, a ASC, b ASC LIMIT $topK""".stripMargin

  /** Oracle twin: same tokenizer CTE as every text query, 1-based list
    * indices mapped to the same 0-based positions, same integer
    * cross-multiplied df-fraction cap. */
  def invertedPostingsSql(topK: Int = 10, dfCapNum: Int = 9, dfCapDen: Int = 10): String =
    s"""WITH toks AS (SELECT doc_id, ${TextOps.tokensSql} AS t FROM documents),
       |occ AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, t[i] AS term
       |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) g),
       |posting AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
       |    array_to_string(list(pos ORDER BY pos), ',') AS positions
       |  FROM occ GROUP BY term, doc_id),
       |ranked AS (SELECT *,
       |    CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df,
       |    row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id ASC) AS rank
       |  FROM posting)
       |SELECT term, doc_id, tf, positions, df, CAST(rank AS BIGINT) AS rank
       |FROM ranked
       |WHERE df * $dfCapDen <= (SELECT count(*) FROM documents) * $dfCapNum
       |  AND rank <= $topK""".stripMargin

  /** The served phrase for the registered `phrase_search` query — a real
    * corpus trigram (measured ~7 occurrences at sf0.01), so the adjacency
    * chain is exercised on live data, not a degenerate empty result. */
  val PhraseTerms: Seq[String] = Seq("stream", "table", "hash")

  /** PHRASE SEARCH — the serve side of [[invertedPostings]], closing the
    * build→serve loop the way `bpe_encode` serves `bpe_train`: the index
    * stores per-(term, doc) POSITION LISTS precisely so phrase/proximity
    * queries can run off postings alone, and until something intersects
    * those positions the column is dead weight. One row per occurrence of
    * the exact k-term phrase: (doc_id, match_pos of its first word),
    * computed by the classic adjacency intersection — slot i's postings,
    * shifted by −i, equi-joined across all slots.
    *
    * Shape: the corpus contributes ONE tokenize+posexplode scan filtered
    * to the phrase's terms (k terms — the filter prunes before any
    * aggregation, so the postings build shuffles only the phrase terms'
    * occurrence rows, df(t₁..tk) of them); the stored positions string is
    * then exploded BACK into ints — deliberately consuming the index's own
    * serialized format — and the k−1 equi-joins on (doc_id, shifted pos)
    * move only those df-bounded rows (AQE broadcasts the small slots). At
    * 100 TB: corpus-linear scan, term-df-bounded everything after —
    * serving an indexed phrase never re-touches non-phrase text. The
    * per-term impact cap invertedPostings applies for RANKED retrieval is
    * deliberately NOT applied: truncating a phrase term's postings to its
    * top-tf docs would silently lose matches; full postings for k named
    * terms are still df-bounded. */
  def phraseSearch(spark: SparkSession, sfDir: String,
      phrase: Seq[String] = PhraseTerms): DataFrame =
    phraseSearchOf(Tables.documents(spark, sfDir), phrase)

  /** Core over an explicit (doc_id, text) frame — specs feed crafted
    * corpora (overlapping self-matches, repeated-term phrases, cross-doc
    * false adjacency). */
  def phraseSearchOf(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val occ = docs
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "term")))
      .filter(col("term").isin(phrase.distinct: _*))
    // the phrase terms' slice of the positional index, in the index's own
    // storage format (the comma-joined sorted position string
    // invertedPostings writes)
    val postings = occ.groupBy(col("term"), col("doc_id"))
      .agg(array_join(transform(sort_array(collect_list(col("pos").cast("long"))),
        x => x.cast("string")), ",").as("positions"))
    val slots = phrase.zipWithIndex.map { case (t, i) =>
      postings.filter(col("term") === t)
        .select(col("doc_id"), explode(split(col("positions"), ",")).as("p"))
        .select(col("doc_id"), (col("p").cast("long") - i).as("match_pos"))
    }
    slots.reduce((a, b) => a.join(b, Seq("doc_id", "match_pos")))
      .select(col("doc_id"), col("match_pos"))
  }

  /** DuckDB twin: the SAME postings derivation (grouped, sorted,
    * comma-joined — re-deriving the index rows, not shortcutting to raw
    * positions), then the same shifted-slot intersection. */
  def phraseSearchSql(phrase: Seq[String] = PhraseTerms): String = {
    // terms interpolate into SQL string literals: anything outside the
    // tokenizer's own alphabet could never match a token AND could break
    // (or inject into) the oracle text — reject it at the boundary
    require(phrase.forall(_.matches("[a-z0-9]+")),
      s"phrase terms must be [a-z0-9]+ tokens, got: ${phrase.mkString(", ")}")
    val inList = phrase.distinct.map(t => s"'$t'").mkString(", ")
    val slotCtes = phrase.zipWithIndex.map { case (t, i) =>
      s"""s$i AS (SELECT doc_id, CAST(p AS BIGINT) - $i AS match_pos
         |  FROM posting, LATERAL (SELECT unnest(string_split(positions, ',')) AS p) u$i
         |  WHERE term = '$t')""".stripMargin
    }.mkString(",\n")
    val joins = (1 until phrase.length)
      .map(i => s"JOIN s$i USING (doc_id, match_pos)").mkString(" ")
    s"""WITH toks AS (SELECT doc_id, ${TextOps.tokensSql} AS t FROM documents),
       |occ AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, t[i] AS term
       |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) g
       |  WHERE t[i] IN ($inList)),
       |posting AS (SELECT term, doc_id,
       |    array_to_string(list(pos ORDER BY pos), ',') AS positions
       |  FROM occ GROUP BY term, doc_id),
       |$slotCtes
       |SELECT s0.doc_id, s0.match_pos FROM s0 $joins""".stripMargin
  }
}
