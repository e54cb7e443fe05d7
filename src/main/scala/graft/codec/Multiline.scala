package graft.codec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multiline codec config — mirrors `lc-lib/codecs/multiline/multiline.go`:
  *   - `what = previous`: a line matching the patterns is appended to the
  *     previous event; a non-matching line flushes and starts a new event
  *     (`multiline.go:185-190`).
  *   - `what = next`: a matching line joins to the *following* line; a
  *     non-matching line completes the event (`multiline.go:236-238`).
  *   - lines are joined with `\n` (`multiline.go:250`).
  *   - `maxBytes`: assembled events are hard-capped — the reference cuts
  *     mid-line so each flushed event's joined text is exactly `maxBytes`
  *     long, with the remainder carried over (`multiline.go:199-223`);
  *     equivalently, each pattern-delimited group's joined text is split
  *     every `maxBytes` characters (see MultilineSpec which checks this
  *     equivalence against a port of the reference state machine).
  * Negation uses the `!` pattern prefix from [[PatternCollection]].
  */
final case class MultilineConfig(
    patterns: Seq[String],
    matchMode: String = "any",
    what: String = "previous",
    maxBytes: Option[Int] = None
) {
  require(what == "previous" || what == "next", s"unknown 'what' value: $what")
  val collection: PatternCollection = PatternCollection(patterns, matchMode)
}

object Multiline {

  /** Batch sessioniser: assembles multiline events per conversation using
    * an ordered window — the Spark-native replacement for the reference's
    * stateful per-stream codec. One shuffle on `conv_id` (required: the
    * grouping is an ordered scan per conversation); everything after is
    * within-partition.
    *
    * Output: one row per assembled event with
    * `(conv_id, first_turn_idx, last_turn_idx, n_lines, text, first_ts, last_ts)`.
    */
  def sessionize(df: DataFrame, cfg: MultilineConfig,
      convCol: String = "conv_id", orderCol: String = "turn_idx",
      textCol: String = "text", tsCol: String = "ts"): DataFrame = {
    val matched = cfg.collection.predicate(col(textCol))
    val w = Window.partitionBy(col(convCol)).orderBy(col(orderCol))

    // boundary = this row starts a new assembled event
    val boundary = cfg.what match {
      case "previous" => !matched // non-matching line flushes, then starts fresh
      case "next" =>
        // new event starts after a non-matching line
        val prevMatched = lag(matched, 1).over(w)
        prevMatched.isNull || !prevMatched
    }

    val grouped = df
      .withColumn("_ml_boundary", boundary.cast("int"))
      .withColumn("_ml_group",
        sum(col("_ml_boundary")).over(w.rowsBetween(Window.unboundedPreceding, 0)))

    val assembled = grouped
      .groupBy(col(convCol), col("_ml_group"))
      .agg(
        sort_array(collect_list(struct(col(orderCol).as("i"),
          col(textCol).as("t"), col(tsCol).as("s")))).as("_lines"))
      .select(
        col(convCol),
        element_at(col("_lines"), 1).getField("i").as("first_turn_idx"),
        element_at(col("_lines"), -1).getField("i").as("last_turn_idx"),
        size(col("_lines")).as("n_lines"),
        array_join(transform(col("_lines"), x => x.getField("t")), "\n").as("text"),
        element_at(col("_lines"), 1).getField("s").as("first_ts"),
        element_at(col("_lines"), -1).getField("s").as("last_ts"))

    cfg.maxBytes match {
      case None => assembled
      case Some(max) =>
        // split the joined text every `max` chars. A trailing EMPTY chunk
        // is intentional when the length is an exact multiple of `max`
        // (including 0): the reference's cut loop leaves a zero-length
        // remainder in the buffer which flushes as an empty event
        // (`multiline.go:199-223` + `:245-248`); proven equivalent to the
        // state machine in MultilineSpec.
        val chunks = transform(
          sequence(lit(0), floor(length(col("text")) / max).cast("int")),
          i => col("text").substr(i * max + 1, lit(max)))
        assembled
          .select(col(convCol), col("first_turn_idx"), col("last_turn_idx"),
            col("n_lines"), col("first_ts"), col("last_ts"),
            posexplode(chunks).as(Seq("chunk_idx", "text")))
          .select(col(convCol), col("first_turn_idx"), col("last_turn_idx"),
            col("n_lines"), col("chunk_idx"), col("text"),
            col("first_ts"), col("last_ts"))
    }
  }

  /** Row-at-a-time port of the reference state machine
    * (`multiline.go:152-265`) — used as the test oracle only.
    * Returns the joined texts of the flushed events, in order, including
    * the final implicit flush (teardown).
    */
  def oracle(lines: Seq[String], cfg: MultilineConfig): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var buffer = scala.collection.mutable.ArrayBuffer.empty[String]
    var bufferLen = 0L
    def flush(): Unit = {
      if (buffer.nonEmpty) {
        out += buffer.mkString("\n")
        buffer = scala.collection.mutable.ArrayBuffer.empty[String]
        bufferLen = 0
      }
    }
    for (line <- lines) {
      val matched = cfg.collection.matches(line)
      if (cfg.what == "previous" && !matched) flush()
      var text = line
      var textLen = text.length.toLong
      cfg.maxBytes.foreach { max =>
        var checkLen = bufferLen + textLen + buffer.length
        while (checkLen >= max) {
          val overflow = checkLen - max
          val cut = (textLen - overflow).toInt
          buffer += text.substring(0, cut)
          bufferLen += cut
          flush()
          text = text.substring(cut)
          textLen -= cut
          checkLen = textLen
        }
      }
      buffer += text
      bufferLen += textLen
      if (cfg.what == "next" && !matched) flush()
    }
    flush()
    out.toSeq
  }
}
