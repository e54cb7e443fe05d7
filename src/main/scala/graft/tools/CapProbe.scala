package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Probe: per-group contribution cap as the TopKSmallest aggregation vs
  * the `row_number() OVER (PARTITION BY ...)` window, on a SKEWED corpus
  * (one hot group owning half the rows — the shape that motivates the
  * aggregation). Args: [nRows] [k]. Reports min-of-3 wall time and the
  * shuffle-write volume of each plan, which is the actual claim: the
  * window shuffles every input row, the aggregation ships O(groups·k)
  * partials.
  */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.nonEmpty) args(0).toLong else 8000000L
    val k = if (args.length > 1) args(1).toInt else 10
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    // half the rows in group 'hot', the rest spread over 999 groups
    val df = s.range(nRows).select(
      when(col("id") % 2 === 0, lit("hot"))
        .otherwise(concat(lit("g"), (col("id") % 999).cast("string"))).as("source"),
      col("id").as("doc_id"))
      .repartition(32).cache()
    df.count()

    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null && te.taskMetrics.shuffleWriteMetrics != null)
          shuffleWrite.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.count() // warm
      var best = Double.MaxValue
      var recs = 0L
      for (_ <- 1 to 3) {
        shuffleWrite.set(0)
        s.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val n = mk.count()
        val sec = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graftbridge.CoreBridge.waitListenerBusEmpty(s.sparkContext)
        s.sparkContext.removeSparkListener(listener)
        if (sec < best) { best = sec; recs = shuffleWrite.get() }
        require(n == 1000L * k, s"$name rows=$n")
      }
      println(f"PROBE $name%-22s best=$best%.3f s  shuffle_records=$recs%,d")
    }

    val key = concat(substring(md5(col("doc_id").cast("string")), 1, 16),
      lit(":"), col("doc_id").cast("string"))
    time("window_row_number") {
      df.withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy(key)))
        .filter(col("rk") <= k).select("source", "doc_id")
    }
    time("top_k_smallest_agg") {
      graft.sample.Sampling.capPerGroup(df, "source", "doc_id", k)
    }
    s.stop()
  }
}
