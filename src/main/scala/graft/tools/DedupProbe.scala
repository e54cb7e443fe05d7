package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Scratch A/B: does a leading xxhash64 join key speed the shingle
  * inverted-index self-join at sf0.1, or does the string key's 8-byte
  * sort prefix already cover it? Exactness is identical either way — the
  * string stays a join key, the hash only leads the composite.
  *
  * MEASURED (sf0.1, local[8], min-of-2 alternating): HASHKEY 7.78 s vs
  * CURRENT 7.20 s — the hash column costs more than it saves (Spark's
  * UTF8String sort already uses an 8-byte binary prefix comparator), so
  * `Dedup.jaccardPairs` keeps the plain string key.
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet(s"$dir/documents.parquet")

    def hashKeyed(df: DataFrame): Long = {
      val sh = df.select(col("doc_id").as("id"),
          explode(Dedup.shingles(col("text"), 3)).as("s"))
        .withColumn("h", xxhash64(col("s")))
      val hot = sh.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") > 20)
      val kept = sh.join(broadcast(hot.select("s")), Seq("s"), "left_anti")
      kept.as("a").join(kept.as("b"),
          col("a.h") === col("b.h") && col("a.s") === col("b.s") &&
            col("a.id") < col("b.id"))
        .groupBy(col("a.id"), col("b.id")).agg(count(lit(1)))
        .count()
    }
    def current(df: DataFrame): Long =
      Dedup.jaccardPairs(df, "doc_id", "text", threshold = 0.0, n = 3, maxDf = 20).count()

    // warm both paths once, then min-of-2 each, alternating
    hashKeyed(docs); current(docs)
    var tH = Double.MaxValue; var tC = Double.MaxValue
    for (_ <- 1 to 2) {
      var t0 = System.nanoTime(); hashKeyed(docs)
      tH = math.min(tH, (System.nanoTime() - t0) / 1e9)
      t0 = System.nanoTime(); current(docs)
      tC = math.min(tC, (System.nanoTime() - t0) / 1e9)
    }
    println(f"HASHKEY $tH%.2f s   CURRENT(string key) $tC%.2f s")
    s.stop()
  }
}
