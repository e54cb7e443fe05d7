package graft.codec

import graft.SparkTestBase
import graft.model.TranscriptGen
import org.apache.spark.sql.functions._

/** Mirrors the reference multiline scenario coverage
  * (`lc-lib/codecs/multiline/multiline_test.go:128-590`): previous/next,
  * negate, multiple patterns any/all, max-bytes splitting & overflow —
  * and proves the Spark window sessioniser equals the row-at-a-time
  * state-machine oracle on generated transcripts.
  */
class MultilineSpec extends SparkTestBase {
  import spark.implicits._

  private val contPattern = Seq("^\\s") // continuation lines are indented

  private def toDf(lines: Seq[String], conv: String = "c0") = {
    lines.zipWithIndex.map { case (t, i) =>
      (conv, i, t, new java.sql.Timestamp(1767225600000L + i * 1000L))
    }.toDF("conv_id", "turn_idx", "text", "ts")
  }

  // order by first_turn_idx (+ chunk when split); helper handles both shapes
  private def runOrdered(lines: Seq[String], cfg: MultilineConfig): Seq[String] = {
    val df = Multiline.sessionize(toDf(lines), cfg)
    val sorted =
      if (df.columns.contains("chunk_idx")) df.orderBy("first_turn_idx", "chunk_idx")
      else df.orderBy("first_turn_idx")
    sorted.collect().map(_.getAs[String]("text")).toSeq
  }

  test("what=previous: indented lines append to previous event") {
    val lines = Seq("head A", "  cont 1", "  cont 2", "head B", "  cont 3")
    val want = Seq("head A\n  cont 1\n  cont 2", "head B\n  cont 3")
    assert(Multiline.oracle(lines, MultilineConfig(contPattern)) == want)
    assert(runOrdered(lines, MultilineConfig(contPattern)) == want)
  }

  test("what=next: matching line joins to the following") {
    // pattern: lines ending in backslash continue
    val cfg = MultilineConfig(Seq("\\\\$"), what = "next")
    val lines = Seq("a \\", "b \\", "c", "d")
    val want = Seq("a \\\nb \\\nc", "d")
    assert(Multiline.oracle(lines, cfg) == want)
    assert(runOrdered(lines, cfg) == want)
  }

  test("negate pattern (! prefix): non-timestamp lines append") {
    val cfg = MultilineConfig(Seq("!^\\d{4}-"))
    val lines = Seq("2026-01-01 start", "cont", "more", "2026-01-02 next")
    val want = Seq("2026-01-01 start\ncont\nmore", "2026-01-02 next")
    assert(Multiline.oracle(lines, cfg) == want)
    assert(runOrdered(lines, cfg) == want)
  }

  test("multiple patterns: any vs all") {
    val lines = Seq("x", "ab", "a", "b", "y")
    val anyCfg = MultilineConfig(Seq("a", "b"), matchMode = "any")
    val allCfg = MultilineConfig(Seq("a", "b"), matchMode = "all")
    assert(Multiline.oracle(lines, anyCfg) == Seq("x\nab\na\nb", "y"))
    assert(Multiline.oracle(lines, allCfg) == Seq("x\nab", "a", "b", "y"))
    assert(runOrdered(lines, anyCfg) == Multiline.oracle(lines, anyCfg))
    assert(runOrdered(lines, allCfg) == Multiline.oracle(lines, allCfg))
  }

  test("max bytes: mid-line split with carry-over (multiline.go:199-223)") {
    val cfg = MultilineConfig(contPattern, maxBytes = Some(10))
    val lines = Seq("abcdefgh", "  ijklmnop", "next")
    val oracle = Multiline.oracle(lines, cfg)
    // joined event "abcdefgh\n  ijklmnop" (19 chars) → 10-char cuts
    assert(oracle == Seq("abcdefgh\n ", " ijklmnop", "next"))
    assert(runOrdered(lines, cfg) == oracle)
  }

  test("max bytes: single oversized line splits repeatedly") {
    val cfg = MultilineConfig(contPattern, maxBytes = Some(5))
    val lines = Seq("aaaaaaaaaaaa") // 12 chars → 5,5,2
    val oracle = Multiline.oracle(lines, cfg)
    assert(oracle == Seq("aaaaa", "aaaaa", "aa"))
    assert(runOrdered(lines, cfg) == oracle)
  }

  test("previous timeout: an event-time gap flushes the buffer (multiline.go:281-319)") {
    val cfg = MultilineConfig(contPattern, previousTimeout = Some(5.0))
    // lines at t=0,1,2 then a 10s gap before the indented continuation:
    // the deadline routine flushed, so "  late cont" starts a NEW event
    val rows = Seq(
      ("c0", 0, "head A", 0L), ("c0", 1, "  cont 1", 1000L), ("c0", 2, "  cont 2", 2000L),
      ("c0", 3, "  late cont", 12000L), ("c0", 4, "head B", 13000L))
      .map { case (c, i, t, ms) => (c, i, t, new java.sql.Timestamp(1767225600000L + ms)) }
      .toDF("conv_id", "turn_idx", "text", "ts")
    val got = Multiline.sessionize(rows, cfg).orderBy("first_turn_idx")
      .collect().map(_.getAs[String]("text")).toSeq
    val want = Seq("head A\n  cont 1\n  cont 2", "  late cont", "head B")
    assert(got == want)
    val timed = Seq(("head A", 0.0), ("  cont 1", 1.0), ("  cont 2", 2.0),
      ("  late cont", 12.0), ("head B", 13.0))
    assert(Multiline.oracleTimed(timed, cfg) == want)
  }

  test("previous timeout: gaps at or under the timeout do not flush") {
    val cfg = MultilineConfig(contPattern, previousTimeout = Some(5.0))
    val timed = Seq(("head", 0.0), ("  c1", 5.0), ("  c2", 10.0))
    assert(Multiline.oracleTimed(timed, cfg) == Seq("head\n  c1\n  c2"))
  }

  test("maxBytes counts BYTES, not characters (multi-byte UTF-8)") {
    // "日本語テキスト" = 6 chars × 3 bytes = 18 bytes; with maxBytes=10 the
    // byte-exact cut keeps 3 runes (9 bytes, backed off from 10)
    val cfg = MultilineConfig(contPattern, maxBytes = Some(10))
    val lines = Seq("日本語テキスト")
    val oracle = Multiline.oracle(lines, cfg)
    assert(oracle == Seq("日本語", "テキス", "ト"))
    assert(runOrdered(lines, cfg) == oracle)
  }

  test("spark sessioniser == oracle with maxBytes on multi-byte transcripts") {
    val cfg = MultilineConfig(contPattern, maxBytes = Some(16))
    val lines = Seq("héad Ä", "  çont über", "日本 mixed ascii", "  🙂🙂🙂🙂", "tail")
    assert(runOrdered(lines, cfg) == Multiline.oracle(lines, cfg))
  }

  test("spark sessioniser == state-machine oracle on generated transcripts") {
    val seed = 42L
    val nConvs = 40L
    val cfg = MultilineConfig(contPattern)
    val df = TranscriptGen.generate(spark, seed, nConvs, parallelism = 4).toDF()
    val got = Multiline.sessionize(df, cfg)
      .select("conv_id", "first_turn_idx", "text")
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getString(2)).toSeq).toMap
    val want = (0L until nConvs).map { c =>
      TranscriptGen.convId(c) ->
        Multiline.oracle(TranscriptGen.turnsFor(seed, c).map(_.text), cfg)
    }.toMap
    assert(got == want)
  }

  test("spark sessioniser == oracle with maxBytes on generated transcripts") {
    val seed = 7L
    val nConvs = 25L
    val cfg = MultilineConfig(contPattern, maxBytes = Some(64))
    val df = TranscriptGen.generate(spark, seed, nConvs, parallelism = 4).toDF()
    val got = Multiline.sessionize(df, cfg)
      .select("conv_id", "first_turn_idx", "chunk_idx", "text")
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.sortBy(r => (r.getInt(1), r.getInt(2))).map(_.getString(3)).toSeq).toMap
    val want = (0L until nConvs).map { c =>
      TranscriptGen.convId(c) ->
        Multiline.oracle(TranscriptGen.turnsFor(seed, c).map(_.text), cfg)
    }.toMap
    assert(got == want)
  }

  test("maxBytes exhausted by the buffer: empty cut + flush, never an over-max event (multiline.go cut loop)") {
    // budget for the incoming line is zero because buffer+joiners already
    // fill maxBytes: the reference appends the EMPTY cut piece and
    // flushes; forcing a rune through would emit an event > maxBytes
    val cfg = MultilineConfig(contPattern, maxBytes = Some(4))
    val lines = Seq("abc", " defg")
    val want = Seq("abc\n", " def", "g")
    assert(Multiline.oracle(lines, cfg) == want)
    assert(runOrdered(lines, cfg) == want, "sessionize and oracle must agree")
    assert(Multiline.oracle(lines, cfg).forall(
      _.getBytes("UTF-8").length <= 4), "no event may exceed maxBytes")
  }
}
