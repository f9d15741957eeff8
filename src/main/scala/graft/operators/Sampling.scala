package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic sampling for training-data curation. A 100 TB pipeline
  * samples constantly (per-language quotas, eval holdouts, ablation
  * subsets) and needs the draw to be REPRODUCIBLE and engine-independent —
  * `rand()` is neither. The primitive here is hash-ordered rank: order a
  * stratum by `md5(key)` (a fixed, uniform, engine-portable permutation)
  * and keep the first k. Same inputs → same sample, in Spark, in DuckDB,
  * on any cluster size.
  */
object Sampling {

  /** Per-language quota sample of the document corpus: the `perStratum`
    * docs with the smallest md5(doc_id) in each lang. Plan: one shuffle on
    * the stratum key; the rank filter compiles to `WindowGroupLimit`, so
    * each task keeps ≤k rows per stratum BEFORE the exchange — the shuffle
    * carries O(strata × k), not the corpus. That is the property that
    * makes quota sampling free at 100 TB. */
  def stratifiedSample(spark: SparkSession, sfDir: String, perStratum: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= perStratum)
  }

  def stratifiedSampleSql(perStratum: Int = 20): String =
    s"""SELECT doc_id, lang, rn FROM (
       |  SELECT doc_id, lang, row_number() OVER (
       |    PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM documents)
       |WHERE rn <= $perStratum""".stripMargin
}
