package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Byte-pair-encoding tokenizer training over the `documents` corpus — the
  * LLM-pipeline operator family the reference's word-count queries grow into
  * (SURVEY.md §2.2 Q1/Q2 tokenize the same way; FIXTURES.md §5).
  *
  * The scale design mirrors how production tokenizer trainers
  * (Sennrich's subword-nmt, HF tokenizers, SentencePiece) handle web-scale
  * corpora: BPE statistics are a function of the WEIGHTED VOCABULARY, not
  * the corpus — so the 100 TB corpus is touched exactly once (the word-count
  * shuffle, identical to [[TextOps.wordcount]]), and every merge iteration
  * runs over |vocab| rows (≤ a few million at any corpus size; Heaps' law)
  * with an O(1) argmax pulled to the driver — the [[Similarity.kmeansTrain]]
  * codebook structure. Symbol sequences live as space-delimited strings so
  * a merge is ONE codegen'd `replace(sym, ' a b ', ' ab ')` — left-to-right
  * non-overlapping, exactly BPE's greedy merge order (proven against a
  * scan-based reference implementation in BpeSpec) — and pair extraction is
  * split + transform over the symbol array: every per-row operation in the
  * loop is a Catalyst builtin, no UDFs anywhere.
  */
object Bpe {

  /** End-of-word marker (Sennrich-style); disjoint from `[a-z0-9]+` tokens
    * so it can never collide with a character or merged symbol. */
  val EndOfWord = "</w>"

  /** Weighted vocabulary: distinct token → corpus frequency. The ONLY
    * corpus-wide pass in the family. */
  private def vocab(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** Iteration-0 BPE statistics: adjacent symbol-pair counts over the
    * character-level vocabulary (including the end-of-word marker pair),
    * weighted by word frequency — top `k` by count. This is exactly the
    * argmax table [[bpeTrain]]'s first merge reads; the spec pins that
    * correspondence. One corpus shuffle (the word count) + one |vocab|-row
    * pair explosion; the exchange after the pair groupBy carries ≤ |Σ|²+|Σ|
    * rows — alphabet-bounded, not corpus-bounded. */
  def bpePairCounts(spark: SparkSession, sfDir: String, k: Int = 30): DataFrame =
    vocab(spark, sfDir)
      .select(col("n"), explode(expr(
        s"""transform(sequence(1, length(w)), i -> struct(
           |  substring(w, i, 1) AS a,
           |  CASE WHEN i = length(w) THEN '$EndOfWord'
           |       ELSE substring(w, i + 1, 1) END AS b))""".stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("n"))
      .groupBy("a", "b").agg(sum(col("n")).as("cnt"))
      .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
      .limit(k)

  def bpePairCountsSql(k: Int = 30): String =
    s"""WITH words AS (
       |  SELECT w, count(*) AS n FROM (
       |    SELECT unnest(${TextOps.tokensSql}) AS w FROM documents) GROUP BY w)
       |SELECT substr(w, i, 1) AS a,
       |  CASE WHEN i = length(w) THEN '$EndOfWord' ELSE substr(w, i + 1, 1) END AS b,
       |  CAST(sum(n) AS BIGINT) AS cnt
       |FROM words, LATERAL (SELECT unnest(range(1, length(w) + 1)) AS i) t
       |GROUP BY a, b ORDER BY cnt DESC, a ASC, b ASC LIMIT $k""".stripMargin

  /** Space-delimited character symbolization: `"low"` →
    * `" l o w </w> "`. Sentinel spaces at both ends let a merge of (a, b)
    * be the literal replace of `" a b "` — every occurrence is
    * space-delimited on both sides by construction. */
  private def symbolize(w: Column): Column =
    concat(lit(" "),
      array_join(regexp_extract_all(w, lit("."), lit(0)), " "),
      lit(s" $EndOfWord "))

  /** Apply a learned merge list to a symbolized column — the ENCODE path.
    * One codegen'd literal replace per merge, folded into a single
    * expression tree (no UDF, no shuffle): how a 100 TB corpus gets
    * re-tokenized after training. */
  def bpeApply(merges: Seq[(String, String)])(sym: Column): Column =
    merges.foldLeft(sym) { case (c, (a, b)) =>
      replace(c, lit(s" $a $b "), lit(s" $a$b ")) }

  /** Learn `numMerges` BPE merges. Per iteration: a |vocab|-row adjacent-
    * pair count (split + transform, alphabet²-bounded exchange), ONE argmax
    * row collected (ties broken (count desc, lhs, rhs) — deterministic
    * across engines and partitionings), and the merge applied as a literal
    * replace. The vocabulary is localCheckpoint'ed at the start (shared by
    * all iterations) and every 8 merges (bounds the replace-chain plan
    * depth); driver traffic is O(1) per merge, O(numMerges) total.
    * Output: the ranked merge table — the tokenizer artifact. */
  def bpeTrain(spark: SparkSession, sfDir: String, numMerges: Int = 20): DataFrame = {
    import spark.implicits._
    var cur = vocab(spark, sfDir)
      .select(symbolize(col("w")).as("sym"), col("n"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = cur
        .select(col("n"), split(trim(col("sym")), " ").as("ss"))
        // size(ss)=1 happens once a word fully merges; sequence(1, 0) is
        // DESCENDING in Spark, so it needs an explicit empty-array branch.
        .select(col("n"), explode(expr(
          """CASE WHEN size(ss) < 2
            |THEN cast(array() AS array<struct<a:string,b:string>>)
            |ELSE transform(sequence(1, size(ss) - 1),
            |               i -> struct(ss[i-1] AS a, ss[i] AS b)) END""".stripMargin)).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank.toLong, a, b, a + b, cnt))
        cur = cur.withColumn("sym", bpeApply(Seq((a, b)))(col("sym")))
        if (rank % 8 == 0) cur = cur.localCheckpoint()
        rank += 1
      }
    }
    merges.result().toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Unrolled-CTE oracle for [[bpeTrain]] — the [[Similarity.kmeansTrainSql]]
    * pattern: layer k recounts pairs over vocab state v(k-1), takes the
    * same deterministically-tied argmax, and applies the same literal
    * replace (DuckDB `replace` and Spark `replace` are both left-to-right
    * non-overlapping). The merge table is the UNION of the per-layer argmax
    * rows. Each vocab state is `AS MATERIALIZED`: v(k-1) is referenced by
    * BOTH p(k) and v(k), and DuckDB's default CTE inlining would otherwise
    * expand the chain to 2^numMerges scans of the base table. */
  def bpeTrainSql(numMerges: Int = 20): String = {
    val union = (1 to numMerges)
      .map(k => s"SELECT CAST($k AS BIGINT) AS merge_rank, a AS lhs, b AS rhs, " +
        s"a || b AS merged, cnt AS pair_count FROM b$k")
      .mkString("\nUNION ALL\n")
    s"WITH ${chainSql(numMerges)}\n$union"
  }

  /** The shared training-chain WITH body: v0 symbolizes the weighted
    * vocabulary, layer k = (pair count over v(k-1), deterministic argmax
    * b(k), literal-replace state v(k)). Each v(k) carries the word column
    * through: the training union only reads the b(k) argmax rows, while
    * the ENCODE oracle reads the final state v(numMerges) — which, because
    * training rewrites the whole vocabulary in place, IS the fully-encoded
    * vocabulary, keyed by word. v(k) takes b(k) by LEFT JOIN ON TRUE with
    * a no-op fallback: if training EXHAUSTS before numMerges (a tiny
    * corpus fully merges early) the empty b(k) must carry v(k-1) forward
    * unchanged — a plain cross join would empty every later state and
    * collapse the encode oracle to zero rows, silently diverging from the
    * engine's early-stopping [[bpeTrain]] loop. */
  private def chainSql(numMerges: Int): String = {
    val base =
      s"""words AS (
         |  SELECT w, count(*) AS n FROM (
         |    SELECT unnest(${TextOps.tokensSql}) AS w FROM documents) GROUP BY w),
         |v0 AS MATERIALIZED (
         |  SELECT w, ' ' || array_to_string(regexp_extract_all(w, '.'), ' ')
         |           || ' $EndOfWord ' AS sym, n
         |  FROM words)""".stripMargin
    val layers = (1 to numMerges).map { k =>
      s"""p$k AS (
         |  SELECT s[i] AS a, s[i + 1] AS b, CAST(sum(n) AS BIGINT) AS cnt
         |  FROM (SELECT string_split(trim(sym), ' ') AS s, n FROM v${k - 1}) t,
         |       LATERAL (SELECT unnest(range(1, len(s))) AS i) u
         |  GROUP BY a, b),
         |b$k AS (SELECT a, b, cnt FROM p$k ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
         |v$k AS MATERIALIZED (
         |  SELECT w, CASE WHEN mk.a IS NULL THEN sym ELSE
         |      replace(sym, ' ' || mk.a || ' ' || mk.b || ' ', ' ' || mk.a || mk.b || ' ')
         |    END AS sym, n
         |  FROM v${k - 1} LEFT JOIN b$k mk ON TRUE)""".stripMargin
    }
    (base +: layers).mkString(",\n")
  }

  /** Corpus TOKENIZATION with the in-engine-trained tokenizer — the serve
    * side of [[bpeTrain]], closing the train→encode loop the way
    * `knn_ivf_trained` closes kmeans→serve. Per document: the whitespace
    * token count and the BPE symbol count under the learned merge list.
    *
    * The decomposition is what makes this a 100 TB plan: the merge chain
    * is applied to each DISTINCT word once (the |vocab|-bounded `wl`
    * frame — [[bpeApply]]'s literal-replace expression tree, codegen'd, no
    * UDF), and documents then pay ONE (doc, word)-count aggregation plus
    * an equi-join on the word — the corpus is never re-scanned per merge
    * and never carries the symbol strings. The vocab join gets NO
    * broadcast hint (a 100 TB corpus's vocabulary is not driver-bounded);
    * AQE broadcasts it at bench scale. Merges themselves are an
    * O(numMerges) driver artifact folded into the expression, exactly like
    * the kmeans codebook pull (Similarity.scala). */
  def bpeEncode(spark: SparkSession, sfDir: String, numMerges: Int = 20): DataFrame = {
    val ms = bpeTrain(spark, sfDir, numMerges).collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val dw = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      // read twice (distinct vocab + the join probe): materialize once
      .localCheckpoint()
    val wl = dw.select(col("w")).distinct()
      .withColumn("ns",
        size(split(trim(bpeApply(ms)(symbolize(col("w")))), " ")).cast("long"))
    dw.join(wl, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), sum(col("c") * col("ns")).as("n_bpe"))
  }

  /** TOKENIZER FERTILITY — the per-language tokenizer-equity card
    * (tokens-per-word "fertility", the metric multilingual tokenizer work
    * reports — NLLB / XLM-R style: a language whose words explode into many
    * subword tokens pays more sequence length per sentence, trains slower
    * and truncates earlier): for each language, whitespace-word volume,
    * BPE-token volume under the corpus-trained [[bpeTrain]] merges,
    * character volume, fertility (BPE tokens per word) and compression
    * (chars per BPE token) in integer ppm. Closes the BPE loop:
    * train ([[bpeTrain]]) → encode ([[bpeEncode]]) → EVALUATE.
    *
    * Token counting (round 10): a word's token count is its merged SUBWORD
    * count — an UNMERGED trailing [[EndOfWord]] sentinel is a segmentation
    * artifact, not a token, so it is excluded (a fully-unmerged c-char word
    * counts c tokens, not c+1); a sentinel merged INTO a subword (`w</w>`)
    * counts as that one token. This is the tokens-per-word definition the
    * NLLB/XLM-R fertility literature reports — counting the bare sentinel
    * inflated fertility_ppm and deflated chars_per_token_ppm relative to
    * any cross-paper comparison. ([[bpeEncode]]'s `n_bpe` deliberately
    * stays the raw SYMBOL count: it reports the merge chain's literal
    * output, the quantity its driver-reference spec replays.)
    *
    * Shape: identical to [[bpeEncode]] — the merge chain applies to each
    * DISTINCT word once (|vocab|-bounded, codegen'd literal-replace tree),
    * the corpus pays one (lang, word) aggregation, and the card is a
    * |langs|-row rollup. */
  def tokenizerFertility(spark: SparkSession, sfDir: String, numMerges: Int = 20): DataFrame = {
    val ms = bpeTrain(spark, sfDir, numMerges).collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val dw = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val wl = dw.select(col("w")).distinct()
      .withColumn("sym", trim(bpeApply(ms)(symbolize(col("w")))))
      // symbols are space-delimited and space-free, so a " </w>" suffix is
      // exactly "the final symbol is the bare sentinel"
      .withColumn("ns",
        (size(split(col("sym"), " ")) -
          when(col("sym").endsWith(s" $EndOfWord"), 1).otherwise(0)).cast("long"))
      .drop("sym")
      .withColumn("wlen", length(col("w")).cast("long"))
    dw.join(wl, Seq("w"))
      .groupBy(col("lang"))
      .agg(sum(col("c")).as("n_words"),
        sum(col("c") * col("ns")).as("n_bpe_tokens"),
        sum(col("c") * col("wlen")).as("n_chars"))
      .withColumn("fertility_ppm", expr("n_bpe_tokens * 1000000 div n_words"))
      .withColumn("chars_per_token_ppm", expr("n_chars * 1000000 div n_bpe_tokens"))
  }

  /** Oracle for [[tokenizerFertility]]: the unrolled training chain, then
    * the same |langs|-row rollup off the final vocab state — with the same
    * bare-sentinel exclusion (a trailing unmerged `</w>` symbol is not a
    * token). */
  def tokenizerFertilitySql(numMerges: Int = 20): String = {
    val tail =
      s"""wl AS (SELECT w, len(string_split(trim(sym), ' '))
         |    - CASE WHEN trim(sym) LIKE '% $EndOfWord' THEN 1 ELSE 0 END AS ns,
         |  CAST(length(w) AS BIGINT) AS wlen FROM v$numMerges),
         |dw AS (SELECT lang, w, count(*) AS c FROM (
         |  SELECT lang, unnest(${TextOps.tokensSql}) AS w FROM documents) GROUP BY 1, 2)
         |SELECT lang, CAST(sum(c) AS BIGINT) AS n_words,
         |  CAST(sum(c * ns) AS BIGINT) AS n_bpe_tokens,
         |  CAST(sum(c * wlen) AS BIGINT) AS n_chars,
         |  CAST(sum(c * ns) * 1000000 // sum(c) AS BIGINT) AS fertility_ppm,
         |  CAST(sum(c * wlen) * 1000000 // sum(c * ns) AS BIGINT) AS chars_per_token_ppm
         |FROM dw JOIN wl USING (w) GROUP BY 1""".stripMargin
    s"WITH ${chainSql(numMerges)},\n$tail"
  }

  /** Oracle for [[bpeEncode]]: the same chain, reading the final vocab
    * state v(numMerges) as the encoded-word symbol counts. */
  def bpeEncodeSql(numMerges: Int = 20): String = {
    // chainSql is interpolated AFTER stripMargin: running stripMargin over
    // the combined text would eat the chain's leading `||` concat operators
    val tail =
      s"""wl AS (SELECT w, len(string_split(trim(sym), ' ')) AS ns FROM v$numMerges),
         |dw AS (SELECT doc_id, w, count(*) AS c FROM (
         |  SELECT doc_id, unnest(${TextOps.tokensSql}) AS w FROM documents) GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(sum(c * ns) AS BIGINT) AS n_bpe
         |FROM dw JOIN wl USING (w) GROUP BY 1""".stripMargin
    s"WITH ${chainSql(numMerges)},\n$tail"
  }
}
