package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: incrementalDedup's bloom prune vs the same verify join without
  * it, with broadcast joins DISABLED so both plans shuffle — the claim
  * under test is that the prune caps the corpus-side exchange at
  * ~|batch| + fpp·|corpus| records instead of |corpus|. Args: [nCorpus]
  * [nBatch]. Reports min-of-3 wall time and shuffle-write records.
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val nCorpus = if (args.nonEmpty) args(0).toLong else 8000000L
    val nBatch = if (args.length > 1) args(1).toLong else 50000L
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
      // force the verify join to shuffle: the probe models the regime
      // where the pruned side is past the broadcast threshold
      .config("spark.sql.autoBroadcastJoinThreshold", -1)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    val corpus = s.range(nCorpus)
      .select(col("id").as("doc_id"),
        concat(lit("corpus document number "), col("id")).as("text"))
      .repartition(32).cache()
    corpus.count()
    // half the batch re-crawls an existing doc, half is new content
    val batch = s.range(nBatch)
      .select((col("id") + 900000000L).as("doc_id"),
        when(col("id") % 2 === 0,
            concat(lit("corpus document number "), col("id")))
          .otherwise(concat(lit("fresh document number "), col("id"))).as("text"))
      .repartition(8).cache()
    batch.count()

    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null && te.taskMetrics.shuffleWriteMetrics != null)
          shuffleWrite.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    // consume a join-DEPENDENT aggregate: a bare count() over the
    // grouped result lets Catalyst prune the left join entirely (group
    // count = distinct batch ids, join-independent) and the corpus side
    // never shuffles — the first probe draft measured exactly that
    def consume(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("n_dups"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      if (sys.env.contains("PROBE_EXPLAIN")) {
        val df = mk
        df.count()
        println(s"########## $name\n${df.queryExecution.executedPlan}")
      }
      shuffleWrite.set(0)
      s.sparkContext.addSparkListener(listener)
      consume(mk) // warm
      org.apache.spark.graftbridge.CoreBridge.waitListenerBusEmpty(s.sparkContext)
      s.sparkContext.removeSparkListener(listener)
      if (sys.env.contains("PROBE_EXPLAIN"))
        println(f"  warm $name recs=${shuffleWrite.get()}%,d")
      var best = Double.MaxValue
      var recs = 0L
      for (_ <- 1 to 3) {
        shuffleWrite.set(0)
        s.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val (n, dups) = consume(mk)
        val sec = (System.nanoTime() - t0) / 1e9
        require(dups > 0, s"$name dups=$dups")
        org.apache.spark.graftbridge.CoreBridge.waitListenerBusEmpty(s.sparkContext)
        s.sparkContext.removeSparkListener(listener)
        if (sys.env.contains("PROBE_EXPLAIN"))
          println(f"  rep $name sec=$sec%.3f recs=${shuffleWrite.get()}%,d")
        if (sec < best) { best = sec; recs = shuffleWrite.get() }
        require(n == nBatch, s"$name rows=$n")
      }
      println(f"PROBE $name%-18s best=$best%.3f s  shuffle_records=$recs%,d")
    }

    time("plain_join") {
      batch.select(col("doc_id").as("id"), xxhash64(col("text")).as("_bh"),
          col("text").as("_btext"))
        .join(corpus.select(xxhash64(col("text")).as("_ch"),
            col("text").as("_ctext"), col("doc_id").as("_cid")),
          col("_bh") === col("_ch") && col("_btext") === col("_ctext"), "left")
        .groupBy("id")
        .agg(count(col("_cid")).as("n_dups"), min(col("_cid")).as("first_dup"))
    }
    time("bloom_pruned") {
      graft.dedup.Dedup.incrementalDedup(corpus, batch, "doc_id", "text")
    }
    s.stop()
  }
}
