package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `fact-courier`'s data-processing surface (the reference's third binary:
  * `/root/reference/fact-courier/munin.go:18-28`, `munintype.go:12-97`,
  * `muninrunner.go`): periodically poll metric plugins, compute each
  * field's real value from its munin DST type, and emit one typed "fact"
  * event per (collection, plugin) into the same pipeline as log events.
  *
  * Spark-first mapping: the poll loop is a periodic scan — batch over a
  * samples table, or continuous via `readStream` with
  * `Trigger.ProcessingTime(collectionInterval)` (the exact analog of
  * `runOnce`'s boundary-aligned `time.After`, `munin.go:72-101`; the
  * StreamingPipeline machinery supplies checkpoint/resume). The DST math
  * is a lag window per metric series — distributed, no driver loop.
  *
  * Semantics mirrored from `munintype.go`:
  *   - GAUGE: value as-is (`munintype.go:34-36`);
  *   - DERIVE: per-second rate vs the previous sample, negatives allowed
  *     (`munintype.go:90-92`);
  *   - COUNTER: per-second rate, assumed monotonic; on decrease a counter
  *     wrap is assumed at the 32-bit boundary when the previous value fit
  *     in 32 bits, else at 64 bits (`munintype.go:57-73`). Documented
  *     divergence: the reference's wrap arithmetic literally computes
  *     `2^31` with Go's XOR operator (= 29) — an evident bug in a
  *     "guess" branch (its own comment says so); this implements the
  *     intended RRDTool behavior (wrap at 2^32 / 2^64) instead;
  *   - COUNTER/DERIVE require a previous sample — a series' first
  *     collection emits nothing for that field (`RequiresPrevious`);
  *   - event envelope: `type=metricsets`,
  *     `event.dataset=fact-courier.munin.<plugin>`,
  *     `metricset.module=fact-courier`, `metricset.name=munin.<plugin>`,
  *     facts keyed per plugin (`munin.go:128-144`).
  *
  * Timestamps are carried as epoch-second longs truncated to the
  * collection boundary (`runOnce` aligns every collection to the interval
  * boundary precisely so each event has one round timestamp).
  */
object Facts {

  /** The interval-boundary collection timestamp (epoch seconds) for a raw
    * sample time — `time.Now().Truncate(interval)` (`munin.go:79`).
    */
  def collectionBoundary(ts: Column, intervalSec: Int): Column =
    // floor, not cast-truncation: a pre-1970 (negative-epoch) sample must
    // land on the boundary BELOW it, matching integer `//` in the oracle
    (floor(unix_timestamp(ts) / intervalSec).cast("long") * intervalSec).cast("long")

  /** Fact events from a samples table with one row per
    * (plugin, field, collection): columns `ts` (epoch-sec boundary long),
    * `plugin`, `field`, `dst` (GAUGE|COUNTER|DERIVE), `value` (double).
    * Returns one event per (ts, plugin): the metricsets envelope plus a
    * `facts` map of field → calculated value.
    */
  def factEvents(samples: DataFrame): DataFrame = {
    val w = Window.partitionBy("plugin", "field").orderBy("ts")
    val prevV = lag(col("value"), 1).over(w)
    val prevT = lag(col("ts"), 1).over(w)
    // duration guard (`muninrunner.go`: `duration <= 0` skips the field):
    // a duplicated or out-of-order boundary (overlapping reprocessed
    // batches) must skip the rate field, not divide by zero — a null
    // divisor nulls the rate, which the aggregate below then drops
    val dur = {
      val d = (col("ts") - prevT).cast("double")
      when(d > 0.0, d)
    }
    val rate = (col("value") - prevV) / dur
    val wrap32 = lit(math.pow(2, 32))
    val wrap64 = lit(math.pow(2, 64))
    val counterRate = when(prevV <= col("value"), rate)
      .otherwise(when(prevV <= wrap32,
          (wrap32 - prevV + col("value")) / dur)
        .otherwise((wrap64 - prevV + col("value")) / dur))
    val calc = when(col("dst") === "GAUGE", col("value"))
      .when(col("dst") === "DERIVE", rate)
      .when(col("dst") === "COUNTER", counterRate)
    samples
      .withColumn("calc", calc)
      // RequiresPrevious: rate types emit no FIELD on the series' first
      // sample (calc null, dropped inside the collect — collect_list
      // skips nulls), but the (ts, plugin) ENVELOPE is still emitted:
      // the reference's collectRunner always returns the metricsets
      // event for a collection that ran, even with an empty result map
      // (`munin.go:150-152`); only the fields skip (`muninrunner.go`)
      .groupBy(col("ts"), col("plugin"))
      .agg(map_from_entries(array_sort(collect_list(
        when(col("calc").isNotNull, struct(col("field"), col("calc")))))).as("facts"))
      .select(
        col("ts"),
        lit("metricsets").as("type"),
        concat(lit("fact-courier.munin."), col("plugin")).as("dataset"),
        lit("fact-courier").as("metricset_module"),
        concat(lit("munin."), col("plugin")).as("metricset_name"),
        col("facts"))
  }
}
