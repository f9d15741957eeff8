package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the minhash pipeline. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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
    t("tokens-only")(graft.Tables.documents(spark, sfDir)
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("tok")).count())
    t("shingles.count")(sh.count())
    t("shingles.count again")(sh.count())
    val exploded = sh.select(col("doc_id"), col("shingle"),
        explode(expr("sequence(0, 15)")).as("i"))
      .withColumn("h", md5(concat(col("i").cast("string"), lit(":"), col("shingle"))))
    t("exploded+md5 agg")(exploded.agg(sum(length(col("h")))).head())
    val slotCols = (0 until 16).map(i => min(when(col("i") === i, col("h"))).as(s"s$i"))
    val sigs = exploded.groupBy(col("doc_id")).agg(slotCols.head, slotCols.tail: _*)
    t("sigs.count")(sigs.count())
    t("sigs.count again")(sigs.count())
    val rows = 4
    val bandKey = (b: Int) =>
      md5(concat_ws("|", (0 until rows).map(k => col(s"s${b * rows + k}")): _*))
    val bands = sigs.select(col("doc_id"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"), bandKey(b).as("bk"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bk").as("bk"))
    t("bands.count (no cache)")(bands.count())
    val cached = bands.cache()
    t("bands cache populate")(cached.count())
    val joined = cached.as("a").join(cached.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    t("self-join distinct")(joined.count())
    t("full minhashLsh fresh")(graft.operators.Dedup.minhashLsh(spark, sfDir).count())
    spark.stop()
  }
}
