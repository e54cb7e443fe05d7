package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("point-in-interval semantics: half-open bounds, multi-match, empty interval") {
    val pts = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")), // == w1 start: IN
      (2L, "u1", ts("2024-01-01 12:00:00")), // == w1 end: OUT; inside w2
      (3L, "u1", ts("2024-01-01 11:30:00")), // inside w1 AND w2
      (4L, "u2", ts("2024-01-01 11:00:00")), // right user, no window
      (5L, "u1", ts("2024-01-02 00:00:00"))  // after everything
    ).toDF("event_id", "user", "ts")
    val ivs = Seq(
      ("u1", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"), 100L),
      ("u1", ts("2024-01-01 11:00:00"), ts("2024-01-01 13:00:00"), 200L),
      ("u1", ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00"), 300L) // empty
    ).toDF("user", "w_start", "w_end", "wid")
    val got = RangeJoin.pointInInterval(pts, ivs, key = "user", tsCol = "ts",
        startCol = "w_start", endCol = "w_end", bucketSeconds = 1800)
      .select("event_id", "wid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (2L, 200L), (3L, 100L), (3L, 200L)))
  }

  test("sub-second boundaries: microsecond compare, never second truncation") {
    def tsu(s: String, micros: Int) = {
      val t = java.sql.Timestamp.valueOf(s); t.setNanos(micros * 1000); t
    }
    val pts = Seq(
      (1L, "u", tsu("2024-01-01 10:00:00", 100000)), // 0.1s: before the .3s end -> IN
      (2L, "u", tsu("2024-01-01 10:00:00", 400000)), // 0.4s: past the .3s end -> OUT
      (3L, "u", tsu("2024-01-01 09:00:00", 100000)), // 0.1s: before the .3s start -> OUT
      (4L, "u", tsu("2024-01-01 09:00:00", 300000))  // exactly the .3s start -> IN
    ).toDF("event_id", "user", "ts")
    val ivs = Seq(
      ("u", tsu("2024-01-01 09:00:00", 300000), tsu("2024-01-01 10:00:00", 300000), 1L)
    ).toDF("user", "w_start", "w_end", "wid")
    // bucket = 1 hour puts the interval's fractional end exactly on a
    // chunk boundary second — the case a floor-of-seconds coverage skips
    val got = RangeJoin.pointInInterval(pts, ivs, key = "user", tsCol = "ts",
        startCol = "w_start", endCol = "w_end", bucketSeconds = 3600)
      .select("event_id").as[Long].collect().toSet
    assert(got == Set(1L, 4L))
  }

  test("chunking invariance: any bucket width yields the identical pair set") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val windows = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 6 HOURS")).as("w_end"),
        col("event_id").as("window_id"))
    val pts = ev.select("event_id", "user_id", "ts")
    def pairs(bucket: Long): Set[(Long, Long)] =
      RangeJoin.pointInInterval(pts, windows, key = "user_id", tsCol = "ts",
          startCol = "w_start", endCol = "w_end", bucketSeconds = bucket)
        .select("event_id", "window_id").as[(Long, Long)].collect().toSet
    val naive = pts.join(windows, Seq("user_id"))
      .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("event_id", "window_id").as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty)
    assert(pairs(21600) == naive) // bucket == interval length
    assert(pairs(3600) == naive)  // fine chunks replicate more, same pairs
    assert(pairs(86400) == naive) // coarse chunks select more, same pairs
  }

  test("plan shape: an equi-join on (key, chunk), never a nested loop") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val windows = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 6 HOURS")).as("w_end"),
        col("event_id").as("window_id"))
    val joined = RangeJoin.pointInInterval(
      ev.select("event_id", "user_id", "ts"), windows,
      key = "user_id", tsCol = "ts", startCol = "w_start", endCol = "w_end",
      bucketSeconds = 21600)
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("NestedLoop") && !physical.contains("Cartesian"),
      physical)
    assert(physical.contains("_chunk"), physical) // the join runs on the chunk key
  }

  test("replication guard: an interval spanning too many chunks fails loudly") {
    val pts = Seq((1L, "u", ts("2024-01-01 00:00:00"))).toDF("event_id", "user", "ts")
    val ivs = Seq(("u", ts("2024-01-01 00:00:00"), ts("2024-03-01 00:00:00"), 1L))
      .toDF("user", "w_start", "w_end", "wid")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(pts, ivs, key = "user", tsCol = "ts",
        startCol = "w_start", endCol = "w_end", bucketSeconds = 60,
        maxChunksPerInterval = 1000).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("widen bucketSeconds")), e.toString)
  }
}
