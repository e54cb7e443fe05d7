package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: q_bpe_encode cost split — the 8-round merge LEARNING
  * loop (one argmax job per round, inherently sequential) vs the
  * single-pass ENCODE projection. Args: [sfDir]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
    println(s"BPE docs=${docs.count()}")
    def timed(label: String)(body: => Unit): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"BPE $label%-8s $best%.3f s")
    }
    // warm
    val warmMerges = graft.text.BpeTrainer.learnMerges(docs, "text", 8)
      .orderBy("rank").select("a", "b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    graft.text.BpeTrainer.tokenCounts(docs, "doc_id", "text", warmMerges)
      .orderBy("doc_id").queryExecution.toRdd.count()
    timed("learn") {
      graft.text.BpeTrainer.learnMerges(docs, "text", 8)
        .orderBy("rank").select("a", "b").collect()
    }
    timed("encode") {
      graft.text.BpeTrainer.tokenCounts(docs, "doc_id", "text", warmMerges)
        .orderBy("doc_id").queryExecution.toRdd.count()
    }
    s.stop()
  }
}
