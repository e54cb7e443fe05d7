package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FactsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String, String, Double)]) =
    Facts.factEvents(rows.toDF("ts", "plugin", "field", "dst", "value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(2), r.getMap[String, Double](5).toMap))
      .toSeq.sortBy(r => (r._1, r._2))

  test("GAUGE emits the value as-is from the first sample (munintype.go:34-36)") {
    val got = run(Seq((300L, "cpu", "user", "GAUGE", 7.5), (600L, "cpu", "user", "GAUGE", 9.0)))
    assert(got == Seq(
      (300L, "fact-courier.munin.cpu", Map("user" -> 7.5)),
      (600L, "fact-courier.munin.cpu", Map("user" -> 9.0))))
  }

  test("DERIVE is the per-second rate, negatives allowed, first sample skipped (munintype.go:90-92)") {
    val got = run(Seq(
      (300L, "if", "in", "DERIVE", 1000.0),
      (600L, "if", "in", "DERIVE", 1600.0),  // +600 over 300 s → 2.0/s
      (1200L, "if", "in", "DERIVE", 1000.0)  // -600 over 600 s → -1.0/s
    ))
    assert(got == Seq(
      // first collection: the FIELD is skipped but the envelope is
      // emitted with an empty facts map (munin.go:150-152)
      (300L, "fact-courier.munin.if", Map.empty[String, Double]),
      (600L, "fact-courier.munin.if", Map("in" -> 2.0)),
      (1200L, "fact-courier.munin.if", Map("in" -> -1.0))))
  }

  test("COUNTER wraps at the 32-bit boundary when the previous value fits 32 bits (munintype.go:57-66 intent)") {
    val nearWrap = math.pow(2, 32) - 100.0
    val got = run(Seq(
      (300L, "net", "rx", "COUNTER", nearWrap),
      (600L, "net", "rx", "COUNTER", 200.0) // wrapped: (2^32 - prev + 200) / 300 = 1.0
    ))
    assert(got == Seq(
      (300L, "fact-courier.munin.net", Map.empty[String, Double]),
      (600L, "fact-courier.munin.net", Map("rx" -> 1.0))))
  }

  test("COUNTER wraps at 64 bits when the previous value exceeds 2^31") {
    val prev = math.pow(2, 63)
    val got = run(Seq(
      (0L, "net", "tx", "COUNTER", prev),
      (100L, "net", "tx", "COUNTER", 0.0)
    ))
    val want = (math.pow(2, 64) - prev) / 100.0
    assert(got == Seq(
      (0L, "fact-courier.munin.net", Map.empty[String, Double]),
      (100L, "fact-courier.munin.net", Map("tx" -> want))))
  }

  test("one event per (collection, plugin) with the metricsets envelope (munin.go:128-144)") {
    val out = Facts.factEvents(Seq(
        (300L, "cpu", "user", "GAUGE", 1.0),
        (300L, "cpu", "sys", "GAUGE", 2.0),
        (300L, "mem", "free", "GAUGE", 3.0)
      ).toDF("ts", "plugin", "field", "dst", "value"))
      .orderBy("dataset").collect()
    assert(out.length == 2, "fields of one plugin merge into one event")
    val cpu = out(0)
    assert(cpu.getString(1) == "metricsets")
    assert(cpu.getString(2) == "fact-courier.munin.cpu")
    assert(cpu.getString(3) == "fact-courier")
    assert(cpu.getString(4) == "munin.cpu")
    assert(cpu.getMap[String, Double](5).toMap == Map("user" -> 1.0, "sys" -> 2.0))
  }

  test("collectionBoundary truncates to the interval like time.Truncate (munin.go:79)") {
    val got = Seq("2024-01-01 00:04:59", "2024-01-01 00:05:00", "2024-01-01 00:07:21")
      .toDF("s")
      .select(Facts.collectionBoundary(to_timestamp(col("s")), 300))
      .collect().map(_.getLong(0)).toSeq
    val base = java.time.LocalDateTime.parse("2024-01-01T00:00:00")
      .toEpochSecond(java.time.ZoneOffset.UTC)
    assert(got == Seq(base, base + 300, base + 300))
    // pre-1970: negative epochs must floor to the boundary BELOW (integer
    // `//` semantics) — cast-truncation toward zero would say 0 here
    val neg = Seq("1969-12-31 23:59:00").toDF("s")
      .select(Facts.collectionBoundary(to_timestamp(col("s")), 300))
      .collect()(0).getLong(0)
    assert(neg == -300L, s"epoch -60 must truncate to -300, got $neg")
  }

  test("duplicated boundary (duration <= 0) skips the rate field like muninrunner.go, never divides by zero") {
    // two DERIVE samples at the SAME boundary: whichever lags first gives
    // dur = 0 -> the field is skipped (null calc), not Infinity/NaN/abort
    val out = run(Seq(
      (300L, "cpu", "m0", "DERIVE", 10.0),
      (300L, "cpu", "m0", "DERIVE", 99.0),
      (600L, "cpu", "m0", "DERIVE", 130.0)))
    assert(out.forall { case (_, _, facts) =>
      facts.values.forall(v => !v.isInfinite && !v.isNaN) })
    // the 600s sample still rates against SOME 300s sample (dur = 300)
    val at600 = out.find(_._1 == 600L).get._3
    assert(at600.keySet == Set("m0") &&
      (at600("m0") == (130.0 - 10.0) / 300 || at600("m0") == (130.0 - 99.0) / 300))
  }

  test("first collection of a rate-only plugin still emits the metricsets envelope with an empty facts map (munin.go:150-152)") {
    val out = run(Seq(
      (300L, "net", "rx", "COUNTER", 5.0),
      (300L, "net", "tx", "DERIVE", 7.0)))
    assert(out == Seq((300L, "fact-courier.munin.net", Map.empty[String, Double])),
      s"collection ran -> envelope emitted, fields skipped; got $out")
  }
}
