package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Edit-distance (fuzzy) self-join — the entity-resolution / typo-matching
  * primitive the relational surface lacked.
  *
  * Problem shape: find all record pairs whose string keys are within
  * Levenshtein distance 1 (near-identical names, IDs with one mistyped
  * character). The naive formulation is a cross join with a `levenshtein`
  * filter — O(n²) comparisons, a planner nested loop, dead at any scale.
  *
  * Scale path: the symmetric-deletion candidate scheme (the SymSpell
  * construction). For τ = 1, `ED(s,t) ≤ 1` implies `D(s) ∩ D(t) ≠ ∅`
  * where `D(x) = {x} ∪ {x with one character deleted}`:
  *   - substitution at i: deleting position i from both sides yields the
  *     same string;
  *   - insertion/deletion: the shorter string is itself a member of the
  *     longer one's deletion set (and of its own).
  * So exploding each name into its ≤ `len+1` deletion variants and
  * equi-joining on the variant yields a candidate superset (shared
  * variants can also arise at distance 2, e.g. "ab"/"ba" share "a"), and
  * one exact `levenshtein ≤ τ` check per candidate restores exactness —
  * proven equal to the naive cross join in FuzzyJoinSpec.
  *
  * 100 TB shape: the explode is a narrow map (linear output, ~len+1
  * variants per row), the candidate join is an equi-join Spark hash-
  * partitions on the variant, and verification is a per-pair codegen'd
  * `levenshtein`. Work scales with corpus × neighborhood density, not
  * corpus². Variant buckets are bounded by how many strings collapse onto
  * one deletion — inherently local, never the whole corpus.
  */
object FuzzyJoin {

  private val Tau = 1

  /** All customer pairs whose names are within edit distance 1
    * (`c_name` is `Customer#%09d`, so each row has a bounded digit-typo
    * neighborhood — the result grows linearly with the corpus). */
  def fuzzyPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    fuzzyPairsOn(cust)
  }

  /** The operator proper, over any (id, name) input. `materializeShared =
    * false` skips the variants checkpoint so plan audits can see through to
    * the source scan (checkpointing truncates lineage to an ExistingRDD,
    * which would make a scan-pruning assertion vacuous). */
  private[graft] def fuzzyPairsOn(records: DataFrame,
                                  materializeShared: Boolean = true): DataFrame = {
    // D(name): the name itself plus every single-character deletion.
    // substr is 1-based: deleting position i = prefix [1, i-1] ++ suffix
    // [i+1, len]. array_distinct collapses equal deletions (repeated
    // characters) so a pair is not counted from two identical variants.
    val deletionSet = array_distinct(concat(
      array(col("name")),
      transform(
        sequence(lit(1), length(col("name"))),
        i => concat(
          col("name").substr(lit(1), i - lit(1)),
          col("name").substr(i + lit(1), length(col("name")))))))
    // Referenced on both sides of the self-join below; materialize once
    // (same shared-subtree discipline as Dedup.ngramJaccard — Spark
    // re-executes lineage per reference otherwise).
    val exploded = records
      .select(col("id"), col("name"), explode(deletionSet).as("v"))
    val variants = if (materializeShared) exploded.localCheckpoint() else exploded
    // A pair can share several variants (e.g. equal names share all of
    // them) → dropDuplicates before the exact check so levenshtein runs
    // once per candidate pair, not once per shared variant.
    val candidates = variants.as("a").join(variants.as("b"),
        col("a.v") === col("b.v") && col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= Tau)
  }

  /** Oracle twin. The length-difference prefilter is exact (edit distance
    * is always ≥ |len(a) − len(b)|, so no tau-qualifying pair is dropped)
    * and cuts the O(n²) candidate set before the expensive levenshtein,
    * which is computed ONCE per surviving candidate in the inner select —
    * at sf0.1 the naive form (levenshtein twice over 112 M ordered pairs)
    * dominated the whole verify run. */
  val fuzzyPairsSql: String =
    s"""SELECT id_a, id_b, name_a, name_b, dist FROM (
       |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       |    a.c_name AS name_a, b.c_name AS name_b,
       |    levenshtein(a.c_name, b.c_name) AS dist
       |  FROM customer a JOIN customer b
       |    ON a.c_custkey < b.c_custkey
       |    AND abs(length(a.c_name) - length(b.c_name)) <= $Tau)
       |WHERE dist <= $Tau""".stripMargin

  /** Entity resolution end-to-end — the textbook composition FUZZY BLOCKING
    * → match graph → CONNECTED COMPONENTS → canonicalization, here over the
    * part-name vocabulary: near-identical product names ("red widget" /
    * "red widgets") resolve to one entity, transitively (a~b~c chains merge
    * even when a and c differ by 2 edits — the property a pairwise join
    * alone cannot give).
    *
    * Scale composition: names aggregate out of the row space first (the
    * vocabulary is orders of magnitude smaller than the table, and the
    * quadratic-ish fuzzy step runs on names, never rows); the match graph
    * comes from the SymSpell join; components from the shared Pregel-style
    * [[Dedup.clustersOfPairs]] kernel (shuffle bounded by |edges| per
    * round); row counts fold back by one broadcast-joinable (entity ← name)
    * map. Names get stable int64 ids via the 56-bit md5 prefix — the CC
    * kernel's labels/convergence-witness need numeric ids, and the oracle
    * rebuilds the same ids in SQL. */
  def entityResolution(spark: SparkSession, sfDir: String): DataFrame = {
    val names = Tables.part(spark, sfDir)
      .groupBy(col("p_name").as("name")).agg(count(lit(1)).as("n_parts"))
      .withColumn("id", Hashing.md5Long(col("name")))
      .localCheckpoint() // feeds the fuzzy join AND the fold-back join
    val pairs = fuzzyPairsOn(names.select(col("id"), col("name")))
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val cc = Dedup.clustersOfPairs(pairs)
    names.join(cc, col("id") === col("doc_id"), "left")
      .withColumn("entity", coalesce(col("cluster_id"), col("id")))
      .groupBy(col("entity"))
      .agg(min(col("name")).as("canonical_name"),
        count(lit(1)).as("n_names"), sum(col("n_parts")).as("n_parts"))
      .select(col("canonical_name"), col("n_names"), col("n_parts"))
  }

  val entityResolutionSql: String =
    s"""WITH RECURSIVE
       |names AS (SELECT p_name AS name, count(*) AS n_parts,
       |    ${Hashing.md5LongSql("p_name")} AS id FROM part GROUP BY 1),
       |pairs AS (SELECT a.id AS doc_a, b.id AS doc_b FROM names a JOIN names b
       |  ON a.id < b.id AND abs(length(a.name) - length(b.name)) <= $Tau
       |  AND levenshtein(a.name, b.name) <= $Tau),
       |${Dedup.ccWalkCtes},
       |ent AS (SELECT n.name, n.n_parts, coalesce(c.cluster_id, n.id) AS entity
       |  FROM names n LEFT JOIN comp c ON c.doc_id = n.id)
       |SELECT min(name) AS canonical_name, CAST(count(*) AS BIGINT) AS n_names,
       |  CAST(sum(n_parts) AS BIGINT) AS n_parts
       |FROM ent GROUP BY entity""".stripMargin
}
