package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Go layout → Spark pattern translation (`actiondate.go:60-95` layouts,
  * Go `time/format.go` token semantics), proven against actual Spark
  * parsing — translation strings alone can lie about the pattern dialect.
  */
class GoTimeSpec extends SparkTestBase {
  import spark.implicits._

  private def parse(layout: String, value: String): Option[java.sql.Timestamp] = {
    val pattern = GoTime.translate(layout)
    Seq(value).toDF("raw")
      .select(try_to_timestamp(col("raw"), lit(pattern)).as("ts"))
      .collect()(0) match {
      case r if r.isNullAt(0) => None
      case r => Some(r.getTimestamp(0))
    }
  }

  private def utc(s: String) =
    java.sql.Timestamp.from(java.time.Instant.parse(s))

  test("RFC3339 and fixed-fraction layouts") {
    assert(parse("2006-01-02T15:04:05Z07:00", "2026-03-04T05:06:07Z")
      .contains(utc("2026-03-04T05:06:07Z")))
    assert(parse("2006-01-02 15:04:05.000", "2026-03-04 05:06:07.125")
      .contains(utc("2026-03-04T05:06:07.125Z")))
  }

  test("trimmed-fraction .999999999 layouts (RFC3339Nano): any width, fraction optional") {
    val nano = "2006-01-02T15:04:05.999999999Z07:00"
    assert(parse(nano, "2026-03-04T05:06:07.5Z")
      .contains(utc("2026-03-04T05:06:07.5Z")))
    assert(parse(nano, "2026-03-04T05:06:07.123456789Z")
      .contains(utc("2026-03-04T05:06:07.123456Z"))) // micro truncation
    assert(parse(nano, "2026-03-04T05:06:07Z")
      .contains(utc("2026-03-04T05:06:07Z")), "zero fraction is omitted entirely in Go")
  }

  test("syslog space-padded day: Jan _2 15:04:05 parses 1- and 2-digit days") {
    // no year in the layout — Spark defaults to 1970 like Go defaults to 0
    assert(parse("Jan _2 15:04:05", "Mar  5 04:00:01").isDefined)
    assert(parse("Jan _2 15:04:05", "Mar 15 04:00:01").isDefined)
    val d1 = parse("Jan _2 15:04:05", "Mar  5 04:00:01").get.toInstant.toString
    assert(d1.contains("-03-05T04:00:01"))
  }

  test("day-of-year 002 (zero-padded)") {
    assert(parse("2006-002", "2026-005").map(_.toInstant.toString.take(10))
      .contains("2026-01-05"))
    assert(parse("2006-002", "2026-036").map(_.toInstant.toString.take(10))
      .contains("2026-02-05"))
  }

  test("shapeRegex is a sound prefilter: every parseable string matches its shape") {
    val cases = Seq(
      ("2006-01-02T15:04:05Z07:00", Seq("2026-03-04T05:06:07Z", "2026-03-04T05:06:07+05:30")),
      ("02/Jan/2006:15:04:05 -0700", Seq("19/May/2024:00:00:00 +0000")),
      ("2006-01-02", Seq("2026-03-04")),
      ("Jan _2 15:04:05", Seq("Mar  5 04:00:01", "Mar 15 04:00:01")),
      ("2006-01-02 15:04:05.000", Seq("2026-03-04 05:06:07.125")),
      ("2006-01-02T15:04:05.999999999Z07:00",
        Seq("2026-03-04T05:06:07.5Z", "2026-03-04T05:06:07Z")))
    for ((layout, vals) <- cases) {
      val re = GoTime.shapeRegex(layout)
      assert(re.isDefined, s"shape must exist for '$layout'")
      for (v <- vals) {
        assert(parse(layout, v).isDefined, s"'$v' must parse under '$layout'")
        assert(v.matches(re.get), s"'$v' must match the shape for '$layout'")
      }
    }
    // and the prefilter earns its keep: cross-format shapes are rejected
    // without paying a parse exception
    assert(!"19/May/2024:00:00:00 +0000".matches(GoTime.shapeRegex("2006-01-02").get))
    assert(!"2026-03-04".matches(GoTime.shapeRegex("02/Jan/2006:15:04:05 -0700").get))
  }

  test("unknown tokens still fail closed") {
    intercept[IllegalArgumentException](GoTime.translate("2006-01-02 Q9"))
  }

  test("weekday layouts (Go UnixDate family) parse via dateParse: name validated, then ignored") {
    // Spark rejects pattern letter 'E' when parsing, so translate() omits
    // the token and dateParse strips the (shape-validated) name
    val layout = "Mon Jan _2 15:04:05 2006"
    def dp(v: String): Option[java.sql.Timestamp] =
      Seq(v).toDF("raw").select(EventFns.dateParse(col("raw"), Seq(layout)).as("ts"))
        .collect()(0) match {
        case r if r.isNullAt(0) => None
        case r => Some(r.getTimestamp(0))
      }
    assert(dp("Wed Mar  4 05:06:07 2026").contains(utc("2026-03-04T05:06:07Z")))
    assert(dp("Sun Mar 15 05:06:07 2026").contains(utc("2026-03-15T05:06:07Z")))
    // Go validates the NAME but not its consistency with the date: any
    // real weekday name parses, an invalid word does not
    assert(dp("Mon Mar  4 05:06:07 2026").isDefined, "wrong-but-valid weekday is ignored")
    assert(dp("Xyz Mar  4 05:06:07 2026").isEmpty, "invalid weekday name fails like Go")
    // full-name form
    assert(Seq("Wednesday Mar 15 05:06:07 2026").toDF("raw")
      .select(EventFns.dateParse(col("raw"), Seq("Monday Jan _2 15:04:05 2006")).as("ts"))
      .collect()(0).getTimestamp(0) != null)
  }

  test("weekdayStrip is ANCHORED to the layout position: weekday substrings in other fields survive") {
    val Some((re, repl)) = GoTime.weekdayStrip("Mon Jan _2 15:04:05 MST 2006")
    def strip(v: String): String =
      Seq(v).toDF("raw").select(regexp_replace(col("raw"), re, repl).as("s"))
        .collect()(0).getString(0)
    // 'Montevideo' contains 'Mon' — the old unanchored per-name replace
    // rewrote it to 'America/tevideo', nulling a parseable timestamp
    assert(strip("Wed Mar  4 05:06:07 America/Montevideo 2026")
      == " Mar  4 05:06:07 America/Montevideo 2026")
    // malformed input (no layout match) passes through untouched —
    // including free-standing weekday words
    assert(strip("hello Monday world") == "hello Monday world")
    // layouts without weekday tokens need no strip at all
    assert(GoTime.weekdayStrip("2006-01-02 15:04:05").isEmpty)
  }

  test("format context: _2 pads single-digit days only; weekday renders; -07:00 is +00:00 at UTC") {
    def fmt(layout: String, iso: String): String =
      Seq(java.sql.Timestamp.from(java.time.Instant.parse(iso))).toDF("ts")
        .select(GoTime.formatColumn(col("ts"), layout).as("s"))
        .collect()(0).getString(0)
    // Go _2: " 5" for day 5, "15" for day 15 — an optional-section [ ]d
    // would print "Mar  15" (the round-5 review finding)
    assert(fmt("Jan _2 15:04:05", "2026-03-05T04:00:01Z") == "Mar  5 04:00:01")
    assert(fmt("Jan _2 15:04:05", "2026-03-15T04:00:01Z") == "Mar 15 04:00:01")
    assert(fmt("Mon Jan _2", "2026-03-04T00:00:00Z") == "Wed Mar  4")
    // Go formats UTC as +00:00 under -07:00 (Z is reserved for Z07:00)
    assert(fmt("2006-01-02T15:04:05-07:00", "2026-03-04T05:06:07Z")
      == "2026-03-04T05:06:07+00:00")
    assert(fmt("2006-01-02T15:04:05Z07:00", "2026-03-04T05:06:07Z")
      == "2026-03-04T05:06:07Z")
  }

  test("numeric zone -07:00 rejects Z when parsing (Go reserves Z for the Z07:00 forms)") {
    assert(parse("2006-01-02T15:04:05-07:00", "2026-03-04T05:06:07Z").isEmpty)
    assert(parse("2006-01-02T15:04:05-07:00", "2026-03-04T05:06:07+05:30")
      .contains(utc("2026-03-03T23:36:07Z")))
    // the shape is Go-exact: Z doesn't match the numeric-zone shape either
    assert(!"2026-03-04T05:06:07Z".matches(
      GoTime.shapeRegex("2006-01-02T15:04:05-07:00").get))
  }
}
