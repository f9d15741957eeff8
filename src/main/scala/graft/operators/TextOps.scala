package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Native re-expressions of the reference's query library (SURVEY.md §2.2)
  * over the `documents` table — the parquet analog of the reference's
  * text-directory inputs (FIXTURES.md §5).
  *
  * Reference semantics:
  *  - word count: `tests/testdata/exec/wc_map.sh:12` (tokenize + lowercase →
  *    `word\t1`) + `wc_reduce.sh:14` (sum per key) ≡
  *    `SELECT word, count(*) GROUP BY word` (SURVEY.md §2.2 Q1/Q2).
  *  - grep: `tests/testdata/exec/grep_map.py:14-28` keeps lines whose
  *    lowercase form contains the query substring (default "product").
  *
  * Scale notes: tokenize→explode→groupBy is a single shuffle with map-side
  * partial aggregation (Spark plans HashAggregate(partial) before the
  * exchange); no driver-side state. At 100 TB the plan is unchanged — AQE
  * coalesces post-shuffle partitions and handles word-frequency skew.
  */
object TextOps {

  /** Lowercased alphanumeric tokens; identical semantics in the DuckDB
    * oracle via `regexp_extract_all(lower(x), '[a-z0-9]+')`. */
  def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  val tokensSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  /** Spark-SQL-text twin of [[tokens]] — for `expr(...)` call sites that
    * need the token array inside a higher-order-function lambda (those
    * take SQL text, not Columns). Spark's regexp_extract_all requires the
    * explicit group index DuckDB defaults. */
  val tokensSparkSql = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"

  /** Q1+Q2: word count over all document text. */
  def wordcount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  val wordcountSql: String =
    s"SELECT w AS word, count(*) AS cnt FROM (SELECT unnest($tokensSql) AS w FROM documents) GROUP BY w"

  /** Word count keyed by (source, word) — the multi-file analog (F2: inputs
    * from many files feed one logical job). */
  def wordcountBySource(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("source"), explode(tokens(col("text"))).as("word"))
      .groupBy("source", "word")
      .agg(count(lit(1)).as("cnt"))

  val wordcountBySourceSql: String =
    s"SELECT source, w AS word, count(*) AS cnt FROM (SELECT source, unnest($tokensSql) AS w FROM documents) GROUP BY source, w"

  /** Q3+Q4: grep — keep documents whose lowercased text contains `q`.
    * The filter is a codegen'd `Contains` predicate pushed into the scan
    * stage; only (doc_id, text) are read from parquet (column pruning). */
  def grep(spark: SparkSession, sfDir: String, q: String = "product"): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(lower(col("text")).contains(q))
      .select(col("doc_id"), col("text"))

  def grepSql(q: String = "product"): String =
    s"SELECT doc_id, text FROM documents WHERE contains(lower(text), '$q')"
}
