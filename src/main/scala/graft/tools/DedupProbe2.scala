package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Scratch probe: round-3 jaccardPairs shape (df-count → broadcast
  * anti-join → self-join) vs the round-4 bounded-posting-list shape, at
  * sf0.1, min-of-3 — confirms the scale-safety restructure is also the
  * faster plan at bench scale.
  */
object DedupProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val maxDf = 20L

    def r3Shape: DataFrame = {
      val sh = docs.select(col("doc_id").as("id"), explode(Dedup.shingles(col("text"), 3)).as("s"))
      val hot = sh.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") > maxDf)
      val filtered = sh.join(broadcast(hot.select("s")), Seq("s"), "left_anti")
      val sizes = docs.select(col("doc_id").as("id"), size(Dedup.shingles(col("text"), 3)).as("n"))
      val inter = filtered.as("a").join(filtered.as("b"),
          col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("c"))
      inter
        .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
        .withColumn("jaccard", col("c").cast("double") / (col("na") + col("nb") - col("c")))
        .filter(col("jaccard") >= 0.8)
    }
    def r4Shape: DataFrame =
      Dedup.jaccardPairs(docs, "doc_id", "text", 0.8, n = 3, maxDf = maxDf)

    for ((name, mk) <- Seq("r3_anti_join" -> (() => r3Shape),
        "r4_postings" -> (() => r4Shape))) {
      val rows = mk().count()
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        mk().count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"PAIRS $name%-14s rows=$rows best=$best%.3f s")
    }
    s.stop()
  }
}
