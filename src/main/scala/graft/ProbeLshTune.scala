package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing + cardinalities of the lshTune pipeline
  * (the round-10 sf10 attribution run — which stage owns the decade). */
object ProbeLshTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.local.dir", LocalDirs.sparkLocalDir)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag: $r in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    import graft.operators.Dedup
    val sh = Dedup.shingles(spark, sfDir)
    t("shingles rows")(sh.count())
    val hs = sh.select(col("doc_id"),
      (graft.operators.Hashing.md5Long(col("shingle")) % Dedup.MinhashM).as("h"))
    t("docsets build (distinct+agg+checkpoint lineage)")(
      hs.distinct().groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("h"))).as("hset"), count(lit(1)).as("nsh"))
        .count())
    val cand = Dedup.lshTuneCandidates(sh)
    t("candidates (cfg,pair) rows")(cand.count())
    t("distinct pairs")(cand.select(col("doc_a"), col("doc_b")).distinct().count())
    t("full lshTune collect")(Dedup.lshTune(spark, sfDir).collect()
      .map(_.toString).mkString(" "))
    spark.stop()
  }
}
