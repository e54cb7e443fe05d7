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
}
