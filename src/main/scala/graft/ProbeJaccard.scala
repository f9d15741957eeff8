package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage timing for the prefix-filtered jaccard. Forces column
  * evaluation with hash-sums so Catalyst can't prune the work away. */
object ProbeJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val threshold = 0.8
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // tmpfs shuffle dirs: host disk is intermittently throttled and was
      // measured turning 3 s shuffles into minutes (DiskBlockObjectWriter-bound)
      .config("spark.local.dir", "/dev/shm/spark-local")
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
    t("sh forced")(sh.agg(sum(hash(col("shingle")))).head())
    val freq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    t("freq forced")(freq.agg(sum(col("df") * hash(col("shingle")))).head())
    val sets = sh.join(freq, "shingle")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("df"), col("shingle")))).as("fs"))
      .withColumn("ss", expr("transform(fs, x -> x.shingle)"))
      .withColumn("n", size(col("ss")))
      .drop("fs")
    t("sets forced")(sets.agg(sum(expr("hash(ss)")), sum(col("n"))).head())
    val prefix = sets.select(col("doc_id"),
      explode(expr(s"slice(ss, 1, CAST(floor(size(ss) * ${1 - threshold}) AS INT) + 2)")).as("shingle"))
    t("prefix forced")(prefix.agg(count(lit(1)), sum(hash(col("shingle")))).head())
    val candidates = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    t("candidates")(candidates.count())
    t("full")(Dedup.ngramJaccard(spark, sfDir, threshold).count())
    t("full again")(Dedup.ngramJaccard(spark, sfDir, threshold).count())
    spark.stop()
  }
}
