package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: `TextAnalysis.termStats`'s df-via-aggregate-join shape
  * (tf → groupBy(term) → join back on term) vs df-via-window (tf →
  * count over Window.partitionBy(term)), both feeding the q_tfidf
  * per-doc top-3 ranking, at sf0.1, min-of-3 warm. The window shape has
  * one fewer operator chain (no second aggregate, no join) over the
  * same three exchanges — the question is whether the window's
  * sort-per-partition costs more than the SortMergeJoin it replaces.
  */
object TfidfProbe {
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
    val n = docs.count()

    def rankTop3(stats: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("tf").desc, col("df").asc, col("term").asc)
      stats.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
    }

    // the shipped shape IS TextAnalysis.termStats — call it, don't copy
    // it, so the probe keeps measuring whatever actually ships
    def joinShape: DataFrame =
      rankTop3(graft.text.TextAnalysis.termStats(docs, "doc_id", "text",
        knownCount = Some(n)))
    def windowShape: DataFrame = {
      val words = when(length(trim(col("text"))) === 0, array().cast("array<string>"))
        .otherwise(split(lower(trim(col("text"))), "\\s+"))
      val tf = docs.select(col("doc_id").as("id"), explode(words).as("term"))
        .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      val wt = org.apache.spark.sql.expressions.Window.partitionBy("term")
      rankTop3(tf.withColumn("df", count(lit(1)).over(wt))
        .withColumn("n_docs", lit(n)))
    }

    for ((name, mk) <- Seq("join_shape" -> (() => joinShape),
        "window_shape" -> (() => windowShape))) {
      val rows = mk().count()
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        mk().count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"TFIDF $name%-13s rows=$rows best=$best%.3f s")
    }
    s.stop()
  }
}
