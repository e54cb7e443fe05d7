package graft.codec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Codec meters — the reference codecs' `Meter()` counters surfaced on
  * the admin API:
  *
  *   - filter codec: `filtered_lines` (`lc-lib/codecs/filter/filter.go:108-117`)
  *   - multiline codec: `pending_lines` (`lc-lib/codecs/multiline/multiline.go:268-279`)
  *
  * Batch analogs: `filtered_lines` is the count of rows the pattern
  * collection rejects; `pending_lines` is the number of lines still
  * buffered (not yet flushed) at the end of the input — for
  * `what = previous` that is every conversation's final group (a previous
  * group only flushes when a later non-matching line arrives); for
  * `what = next` a buffer survives only when the conversation's last line
  * matched (a non-matching line flushes immediately).
  */
object CodecMeters {

  /** One row: (kept_lines, filtered_lines). One aggregate pass. */
  def filterMeter(df: DataFrame, patterns: Seq[String],
      matchMode: String = "any", textCol: String = "text"): DataFrame = {
    val keep = FilterCodec.keep(col(textCol), patterns, matchMode)
    df.agg(
      sum(when(keep, 1L).otherwise(0L)).as("kept_lines"),
      sum(when(keep, 0L).otherwise(1L)).as("filtered_lines"))
  }

  /** One row: (pending_lines, open_buffers). */
  def multilinePending(df: DataFrame, cfg: MultilineConfig,
      convCol: String = "conv_id", orderCol: String = "turn_idx",
      textCol: String = "text"): DataFrame = {
    val matched = cfg.collection.predicate(col(textCol))
    val w = Window.partitionBy(col(convCol)).orderBy(col(orderCol))
    val wAll = Window.partitionBy(col(convCol))
    val boundary = cfg.what match {
      case "previous" => !matched
      case "next" =>
        val prevMatched = lag(matched, 1).over(w)
        prevMatched.isNull || !prevMatched
    }
    val grouped = df
      .withColumn("_ml_matched", matched)
      .withColumn("_ml_group",
        sum(boundary.cast("int")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_ml_last_group", max(col("_ml_group")).over(wAll))
      .withColumn("_ml_last_matched",
        last(col("_ml_matched")).over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val pendingRow = cfg.what match {
      case "previous" => col("_ml_group") === col("_ml_last_group")
      case "next" => col("_ml_group") === col("_ml_last_group") && col("_ml_last_matched")
    }
    grouped.agg(
      sum(when(pendingRow, 1L).otherwise(0L)).as("pending_lines"),
      count_distinct(when(pendingRow, col(convCol))).as("open_buffers"))
  }
}
