package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe: the r7 join operators' scale shapes vs their naive
  * spellings, MEASURED (the PLANS.md claims are about shuffled
  * candidate volume — this prints wall time and the shuffle-record
  * counts from the Spark listener so the claim is a number, not an
  * assertion).
  *
  * As-of: every event is both a fact and a version (the worst case —
  * thousands of versions per key), so the naive candidate equi-join
  * shuffles ~Σ n_k² pairs per key while the union-window shuffles each
  * row once. Range: the naive spelling is the same key equi-join +
  * range filter; the bucketized join replicates each interval ≤
  * len/bucket + 1 times instead.
  *
  * Args: [sfDir] [replicas] (default /root/testdata/sf0.1, 4).
  */
object JoinProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val replicas = if (args.length > 1) args(1).toInt else 4
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      // both sides of a 10^12-row join won't broadcast — model that
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    val shuffleRecords = new java.util.concurrent.atomic.AtomicLong
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shuffleRecords.addAndGet(e.taskMetrics.shuffleWriteMetrics.recordsWritten)
    })

    // replicate events with shifted users so key cardinality stays
    // constant per replica while volume grows
    val ev0 = s.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp").as("ts"))
    val ev = (0 until replicas).map { k =>
      ev0.select((col("event_id") + k * 10000000L).as("event_id"),
        col("user_id"), (col("ts") + expr(s"INTERVAL ${k * 7} SECONDS")).as("ts"))
    }.reduce(_ unionByName _).cache()
    val n = ev.count()
    println(s"events: $n rows, ${ev.select("user_id").distinct().count()} users")

    // optional focus: GRAFT_JOIN_PROBE=prefix1,prefix2 runs a subset
    val wanted = sys.env.get("GRAFT_JOIN_PROBE").map(_.split(",").map(_.trim).toSet)
    def timed(name: String, consume: String)(df: => DataFrame): Unit = {
      if (wanted.exists(w => !w.exists(name.startsWith))) return
      // warm once for JIT/codegen, then measure min of 2. Consume an
      // aggregate DEPENDING on the joined column — a bare count() lets
      // Catalyst prune the very window/join under test
      var best = Double.MaxValue; var recs = 0L; var rows = 0L
      for (r <- 0 to 2) {
        shuffleRecords.set(0)
        val t0 = System.nanoTime()
        rows = df.agg(count(col(consume))).head.getLong(0)
        val dt = (System.nanoTime() - t0) / 1e9
        if (r > 0 && dt < best) { best = dt; recs = shuffleRecords.get }
      }
      println(f"$name%-28s $best%8.2f s   shuffle_records=$recs%,14d   matched_rows=$rows%,d")
    }

    // ---- as-of: every event versioned by the user's latest prior event
    val dims = ev.select(col("user_id"), col("ts"),
      col("event_id").as("v_id"))
    timed("asof union-window", "v_id") {
      graft.operators.AsOfJoin.asOf(
        ev.select("event_id", "user_id", "ts"), dims,
        key = "user_id", tsCol = "ts")
    }
    timed("asof naive join+argmax", "v_id") {
      val cand = ev.select("event_id", "user_id", "ts")
        .join(dims.withColumnRenamed("ts", "v_ts"), Seq("user_id"))
        .filter(col("v_ts") <= col("ts"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_id").orderBy(col("v_ts").desc, col("v_id").desc)
      cand.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select("event_id", "v_id")
    }

    // ---- range: events vs 6-hour windows after each signup-replica row
    val windows = ev.filter(col("event_id") % 5 === 0)
      .select(col("user_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 6 HOURS")).as("w_end"),
        col("event_id").as("window_id"))
    timed("range bucketized", "window_id") {
      graft.operators.RangeJoin.pointInInterval(
        ev.select("event_id", "user_id", "ts"), windows,
        key = "user_id", tsCol = "ts", startCol = "w_start", endCol = "w_end",
        bucketSeconds = 21600)
    }
    timed("range naive join+filter", "window_id") {
      ev.select("event_id", "user_id", "ts").join(windows, Seq("user_id"))
        .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
        .select("event_id", "window_id")
    }
    s.stop()
  }
}
