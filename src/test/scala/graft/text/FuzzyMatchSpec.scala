package graft.text

import graft.SparkTestBase

class FuzzyMatchSpec extends SparkTestBase {
  import spark.implicits._

  private def pairs(names: Seq[String], maxDist: Int = 2) =
    FuzzyMatch.fuzzyNamePairs(names.toDF("p_name"), "p_name", maxDist)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))

  test("typo pairs match with corpus frequencies; identical strings are excluded") {
    val got = pairs(Seq("blue widget", "blue widget", "blue widget",
      "blu widget", "red bolt", "red bolt"))
    // dist-1 variant pair with n_b >> n_a is the resolution signal
    assert(got.toSeq == Seq(("blu widget", "blue widget", 1, 1L, 3L)))
    // the three identical "blue widget" copies produced NO dist-0 pair
    assert(!got.exists(_._3 == 0))
  }

  test("a HEAD edit escapes the prefix block but the suffix block catches it") {
    // "xlue widget" vs "blue widget": first-2 keys differ (xl/bl) but
    // last-2 ("et") agree — union blocking must keep the pair
    val got = pairs(Seq("blue widget", "xlue widget"))
    assert(got.length == 1 && got.head._3 == 1)
  }

  test("an edit touching BOTH ends is missed by construction (the disclosed trade)") {
    // "alue widgex" differs from "blue widget" at head AND tail: both
    // blocking keys diverge, so no candidate pair forms even though
    // dist = 2 — the documented recall boundary of two-key blocking
    val got = pairs(Seq("blue widget", "alue widgex"))
    assert(got.isEmpty)
  }

  test("canonicalisation and guards: case/trim folds, short and null names drop") {
    val got = pairs(Seq("  Blue Widget ", "blu widget", "x", null))
    assert(got.length == 1)
    assert(got.head._1 == "blu widget" && got.head._2 == "blue widget")
  }
}
