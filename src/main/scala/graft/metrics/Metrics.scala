package graft.metrics

import org.apache.spark.sql.DataFrame

/** Per-run metrics report — the admin-API analog (SURVEY.md §3.3): the
  * reference exposes per-harvester `speed_lps`/`speed_bps`/
  * `processed_lines`/`completion` counters (`lc-lib/harvester/
  * harvester.go:540-568`) and per-endpoint published-line counts
  * (`lc-lib/publisher/endpoint/api.go:34-45`). Ours: per-sink turn/byte
  * counts plus wall-clock throughput, rendered as one JSON document.
  */
object Metrics {

  final case class SinkMetric(sink: String, turns: Long, bytes: Long)
  final case class Report(
      inputTurns: Long,
      wallClockSec: Double,
      turnsPerSec: Double,
      bytesPerSec: Double,
      sinks: Seq[SinkMetric])

  def fromSinkCounts(sinkCounts: DataFrame, wallClockSec: Double): Report = {
    val rows = sinkCounts.collect().map { r =>
      SinkMetric(r.getAs[String]("sink"), r.getAs[Long]("turns"), r.getAs[Long]("bytes"))
    }.toSeq.sortBy(_.sink)
    val totalTurns = rows.map(_.turns).sum
    val totalBytes = rows.map(_.bytes).sum
    Report(totalTurns, wallClockSec,
      if (wallClockSec > 0) totalTurns / wallClockSec else 0.0,
      if (wallClockSec > 0) totalBytes / wallClockSec else 0.0,
      rows)
  }

  def toJson(r: Report): String = {
    val sinks = r.sinks.map(s =>
      s"""{"sink":"${s.sink}","turns":${s.turns},"bytes":${s.bytes}}""").mkString(",")
    f"""{"input_turns":${r.inputTurns},"wall_clock_sec":${r.wallClockSec}%.3f,""" +
      f""""turns_per_sec":${r.turnsPerSec}%.1f,"bytes_per_sec":${r.bytesPerSec}%.1f,""" +
      s""""sinks":[$sinks]}"""
  }
}
