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
    maxBytes: Option[Int] = None,
    /** `previous timeout` in seconds (`multiline.go:281-319`): with
      * `what = previous`, a buffered event auto-flushes when no further
      * line arrives within the timeout. The batch analog of the deadline
      * routine: an event-time gap larger than the timeout is a flush
      * boundary.
      */
    previousTimeout: Option[Double] = None
) {
  require(what == "previous" || what == "next", s"unknown 'what' value: $what")
  require(previousTimeout.isEmpty || what == "previous",
    "'previous timeout' only applies to what=previous (multiline.go config)")
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
    val patternBoundary = cfg.what match {
      case "previous" => !matched // non-matching line flushes, then starts fresh
      case "next" =>
        // new event starts after a non-matching line
        val prevMatched = lag(matched, 1).over(w)
        prevMatched.isNull || !prevMatched
    }
    // `previous timeout` (multiline.go:281-319): a gap since the previous
    // line larger than the timeout means the deadline routine flushed the
    // buffer — this line starts a new event regardless of its match
    val boundary = cfg.previousTimeout match {
      case None => patternBoundary
      case Some(gapSec) =>
        // via timestamp (not a direct double cast — TIMESTAMP_NTZ inputs
        // reject that); session timezone is UTC everywhere in this repo
        val sec = (c: Column) => c.cast("timestamp").cast("double")
        val gap = sec(col(tsCol)) - sec(lag(col(tsCol), 1).over(w))
        patternBoundary || coalesce(gap > gapSec, lit(false))
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
        // split the joined text every `max` BYTES (the reference counts
        // bytes, `multiline.go:199-223`; a char-based substring silently
        // diverges on multi-byte UTF-8 — cuts back off to the last rune
        // boundary, see Utf8ChunkBytes). A trailing EMPTY chunk is
        // intentional when the final cut consumes exactly `max` bytes
        // (including length 0): the reference's cut loop leaves a
        // zero-length remainder in the buffer which flushes as an empty
        // event (`multiline.go:245-248`); proven equivalent to the state
        // machine port in MultilineSpec.
        val chunks = graft.functions.Utf8ChunkBytes(col("text"), max)
        assembled
          .select(col(convCol), col("first_turn_idx"), col("last_turn_idx"),
            col("n_lines"), col("first_ts"), col("last_ts"),
            posexplode(chunks).as(Seq("chunk_idx", "text")))
          .select(col(convCol), col("first_turn_idx"), col("last_turn_idx"),
            col("n_lines"), col("chunk_idx"), col("text"),
            col("first_ts"), col("last_ts"))
    }
  }

  /** UTF-8 byte length of a String. */
  private def utf8Len(s: String): Long =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong

  /** Char index of the largest rune-complete prefix of `s` whose UTF-8
    * encoding is ≤ `maxBytes` bytes (the oracle-side mirror of
    * [[graft.functions.ByteTrunc.safeCut]]'s back-off).
    */
  private def byteCut(s: String, maxBytes: Long): Int = {
    var bytes = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cpBytes =
        if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4
      if (bytes + cpBytes > maxBytes) return i
      bytes += cpBytes
      i += Character.charCount(cp)
    }
    s.length
  }

  /** Row-at-a-time port of the reference state machine
    * (`multiline.go:152-265` + deadline flush `:281-319`) — used as the
    * test oracle only. Byte-accurate accounting (`multiline.go:199-223`
    * counts bytes; +1 per joined newline) with the documented rune-safe
    * back-off divergence. Returns the joined texts of the flushed events,
    * in order, including the final implicit flush (teardown).
    */
  def oracle(lines: Seq[String], cfg: MultilineConfig): Seq[String] =
    oracleTimed(lines.map((_, 0.0)), cfg)

  def oracleTimed(lines: Seq[(String, Double)], cfg: MultilineConfig): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var buffer = scala.collection.mutable.ArrayBuffer.empty[String]
    var bufferLen = 0L // bytes
    var lastTs = Double.NaN
    def flush(): Unit = {
      if (buffer.nonEmpty) {
        out += buffer.mkString("\n")
        buffer = scala.collection.mutable.ArrayBuffer.empty[String]
        bufferLen = 0
      }
    }
    for ((line, ts) <- lines) {
      // deadline routine: no line within `previous timeout` → flush
      cfg.previousTimeout.foreach { t =>
        if (!lastTs.isNaN && ts - lastTs > t) flush()
      }
      lastTs = ts
      val matched = cfg.collection.matches(line)
      if (cfg.what == "previous" && !matched) flush()
      var text = line
      var textLen = utf8Len(text)
      cfg.maxBytes.foreach { max =>
        var checkLen = bufferLen + textLen + buffer.length
        while (checkLen >= max) {
          val overflow = checkLen - max
          var cutChars = byteCut(text, textLen - overflow)
          // forced progress when one code point exceeds the budget
          // (max < 4 pathology): take the whole rune — but ONLY with an
          // empty buffer. With buffered lines, a zero cut means the
          // budget went to the buffer+joiners: the reference appends the
          // empty cut piece and flushes (`multiline.go`: cut = len -
          // overflow = 0), the flush itself being the progress — forcing
          // a rune here would emit an event LARGER than max
          if (cutChars == 0 && text.nonEmpty && buffer.isEmpty)
            cutChars = Character.charCount(text.codePointAt(0))
          val kept = text.substring(0, cutChars)
          val keptBytes = utf8Len(kept)
          buffer += kept
          bufferLen += keptBytes
          flush()
          text = text.substring(cutChars)
          textLen -= keptBytes
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
