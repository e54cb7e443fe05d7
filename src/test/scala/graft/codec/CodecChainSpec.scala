package graft.codec

import graft.SparkTestBase
import graft.pipeline.{FilterStage, Pipeline}

/** Codec chains: the reference composes codecs last-to-first
  * (`lc-lib/codecs/stream.go:95-115`), e.g. filter THEN multiline.
  * Ours composes naturally: a filter stage feeding the sessioniser.
  */
class CodecChainSpec extends SparkTestBase {
  import spark.implicits._

  test("filter codec then multiline codec") {
    val lines = Seq("head A", "  cont", "DROPME", "head B", "  more", "  even more")
    val df = lines.zipWithIndex.map { case (t, i) =>
      ("c0", i, "user", t, "none", new java.sql.Timestamp(i * 1000L))
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

    val filtered = Pipeline(df, Seq(FilterStage(Seq("!DROPME"))))
    val out = Multiline.sessionize(filtered, MultilineConfig(Seq("^\\s")))
      .orderBy("first_turn_idx")
      .collect().map(_.getAs[String]("text")).toSeq
    assert(out == Seq("head A\n  cont", "head B\n  more\n  even more"))

    // oracle composition agrees
    val kept = lines.filterNot(_ == "DROPME")
    assert(Multiline.oracle(kept, MultilineConfig(Seq("^\\s"))) == out)
  }
}
