package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of semantics: latest preceding match, inclusive ties, NULL before first dim row") {
    val facts = Seq(
      (1L, "u1", ts("2024-01-01 09:00:00"), "a"),
      (2L, "u1", ts("2024-01-01 10:00:00"), "b"), // exactly at v2: inclusive
      (3L, "u1", ts("2024-01-01 11:30:00"), "c"),
      (4L, "u2", ts("2024-01-01 08:00:00"), "d"), // before u2's first version
      (5L, "u2", ts("2024-01-01 12:00:00"), "e"),
      (6L, "u3", ts("2024-01-01 12:00:00"), "f")  // key with no dim rows at all
    ).toDF("event_id", "user", "ts", "payload")
    val dims = Seq(
      ("u1", ts("2024-01-01 08:00:00"), 100L),
      ("u1", ts("2024-01-01 10:00:00"), 200L),
      ("u2", ts("2024-01-01 09:30:00"), 300L)
    ).toDF("user", "ts", "version")

    val out = AsOfJoin.asOf(facts, dims, key = "user", tsCol = "ts")
      .select("event_id", "version").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(
      1L -> Some(100L), 2L -> Some(200L), 3L -> Some(200L),
      4L -> None, 5L -> Some(300L), 6L -> None))
  }

  test("tolerance: matches older than the lookback are discarded") {
    val facts = Seq(
      (1L, "u1", ts("2024-01-03 08:00:00")),
      (2L, "u1", ts("2024-01-10 08:00:00"))
    ).toDF("event_id", "user", "ts")
    val dims = Seq(("u1", ts("2024-01-01 08:00:00"), 7L)).toDF("user", "ts", "v")
    val out = AsOfJoin.asOf(facts, dims, key = "user", tsCol = "ts",
        tolerance = Some("5 days"))
      .select("event_id", "v").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(7L), 2L -> None)) // 9 days stale > 5-day lookback
  }

  test("plan shape: ONE shuffle on the key, a window, and NO join node (parquet-backed)") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val dims = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
    val joined = AsOfJoin.asOf(
      ev.select("event_id", "user_id", "ts", "event_type"), dims,
      key = "user_id", tsCol = "ts")
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("Join"), s"candidate-pair join crept in:\n$optimized")
    val physical = joined.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(physical).length
    assert(shuffles == 1, s"expected one key shuffle, saw $shuffles:\n$physical")
    assert(physical.contains("Window"), physical)
    // and it agrees with a local replay of the point-in-time rule
    // compare on epoch micros: the parquet ts is NTZ, which collects as
    // LocalDateTime in Spark 4
    val dimRows = dims.select(col("user_id"), col("ts").cast("timestamp").cast("long"),
        col("signup_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = ev.select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").cast("long")).collect().map { r =>
      val best = dimRows.filter(d => d._1 == r.getLong(1) && d._2 <= r.getLong(2))
        .sortBy(_._2).lastOption.map(_._3)
      r.getLong(0) -> best
    }.toMap
    val got = joined.select("event_id", "signup_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == expect)
  }

  test("right rows tied on (key, ts) pick deterministically across partitionings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two dim versions at the SAME microsecond: the struct-greatest one
    // (payload (9, 900)) must win, on every partitioning
    val right = Seq((7L, 100L, 3L, 300L), (7L, 100L, 9L, 900L))
      .toDF("k", "ts", "ver_id", "ver_val")
    val left = Seq((7L, 100L, 1L), (7L, 150L, 2L)).toDF("k", "ts", "ev")
    def run(r: org.apache.spark.sql.DataFrame) =
      graft.operators.AsOfJoin.asOf(left, r, "k", "ts")
        .orderBy("ev").select("ev", "ver_id", "ver_val")
        .as[(Long, Long, Long)].collect().toSeq
    val a = run(right)
    val b = run(right.repartition(7))
    val c = run(right.repartition(1).sortWithinPartitions(desc("ver_id")))
    assert(a == b && b == c, s"tie pick must not depend on partitioning: $a / $b / $c")
    assert(a.forall { case (_, vid, vv) => vid == 9L && vv == 900L })
  }
}
