package graft.functions

/** Translates Go `time` reference layouts (`Mon Jan 2 15:04:05 MST 2006`)
  * into JVM `DateTimeFormatter` patterns, so configs written for the
  * reference's `date` action (`lc-lib/processor/actiondate.go:60-95`) and
  * `%{+layout}` pattern strings (`lc-lib/event/pattern.go:74-81`) work
  * unchanged. Finite token table; **fails closed** on unknown tokens
  * (SURVEY.md §7 risk register).
  *
  * Parse and format contexts translate differently where the JVM forces
  * it (one shared table keeps the three views in lockstep):
  *
  *  - weekday names (`Mon`/`Monday`): Go time.Parse validates the name
  *    and otherwise IGNORES it (no cross-check against the date), but
  *    Spark rejects pattern letter 'E' when parsing outright. The parse
  *    pattern therefore omits the token and [[weekdayStrip]] hands the
  *    caller a regex that removes the (valid) name from the input before
  *    parsing — the shape regex validates the name, completing Go's
  *    semantics. Formatting uses `EEE`/`EEEE` normally.
  *  - space-padded `_2`/`__2`: an optional-section `[ ]d` parses both
  *    `" 5"` and `"15"`, but when FORMATTING an optional section always
  *    prints its literal, so `Mar 15` would render as `Mar  15` — and
  *    Spark rejects the JVM pad modifier (`p`) outright, so no single
  *    pattern can express Go's space-pad. [[formatColumn]] therefore
  *    returns a COLUMN plan: the layout split at padded-day tokens,
  *    each rendered as `lpad(date_format(ts, "d"), w, " ")` and
  *    concatenated with the pattern-formatted runs around it.
  *  - numeric zone `-07:00` maps to `xxx` (parses ±HH:MM only and
  *    formats UTC as `+00:00`, both exactly Go; the earlier `XXX`
  *    accepted/emitted `Z`, which Go reserves for the `Z07:00` forms).
  *
  * Known bounded divergences (documented, not silent): JVM `x`/`X`
  * accept `±HHMM` where Go's `-07`/`Z07` accept hours only — the shape
  * regex pins the GUARDED parse (EventFns.dateParse) to Go's exact set,
  * while an unguarded parse is a superset; and formatting a
  * non-whole-hour zone under `-07` prints `+HHmm` where Go truncates to
  * the hour (lossy in Go, pathological input either way).
  */
object GoTime {

  /** One row per Go token, longest-first so e.g. "2006" wins over "2"
    * and "Monday" over "Mon": (go, parse pattern, format pattern,
    * shape regex). A single table: the three views can't drift apart
    * (the round-4 layout bugs all came from hand-synchronized twins).
    */
  private val table: Seq[(String, String, String, String)] = Seq(
    ("2006", "yyyy", "yyyy", "\\d{4}"),
    ("January", "MMMM", "MMMM", "[A-Za-z]+"),
    ("Jan", "MMM", "MMM", "[A-Za-z]{3}"),
    ("Monday", "", "EEEE",
      "(?:Monday|Tuesday|Wednesday|Thursday|Friday|Saturday|Sunday)"),
    ("Mon", "", "EEE", "(?:Mon|Tue|Wed|Thu|Fri|Sat|Sun)"),
    (".000000000", ".SSSSSSSSS", ".SSSSSSSSS", "\\.\\d{9}"),
    (".000000", ".SSSSSS", ".SSSSSS", "\\.\\d{6}"),
    (".000", ".SSS", ".SSS", "\\.\\d{3}"),
    ("-07:00", "xxx", "xxx", "[+-]\\d{2}:\\d{2}"),
    ("-0700", "xx", "xx", "[+-]\\d{4}"),
    ("-07", "x", "x", "[+-]\\d{2}"),
    ("Z07:00", "XXX", "XXX", "(?:Z|[+-]\\d{2}:\\d{2})"),
    ("Z0700", "XX", "XX", "(?:Z|[+-]\\d{4})"),
    ("Z07", "X", "X", "(?:Z|[+-]\\d{2})"),
    ("MST", "zzz", "zzz", "[A-Za-z][A-Za-z0-9/_+-]*"),
    ("15", "HH", "HH", "\\d{1,2}"),
    // day-of-year (Go layout "002": zero-padded; "__2": space-padded to 3)
    ("002", "DDD", "DDD", "\\d{1,3}"),
    // space-padded day tokens: no JVM pattern can space-pad (class
    // doc) — the format view is empty and formatColumn matches the GO
    // token itself to splice an lpad'd day column
    ("__2", "[ ][ ]D", "", "\\s{0,2}\\d{1,3}"),
    // space-padded day of month — the classic syslog "Jan _2 15:04:05"
    // layout; the optional-space section absorbs the pad for days 1-9
    ("_2", "[ ]d", "", "\\s?\\d{1,2}"),
    ("01", "MM", "MM", "\\d{1,2}"),
    ("02", "dd", "dd", "\\d{1,2}"),
    ("03", "hh", "hh", "\\d{1,2}"),
    ("04", "mm", "mm", "\\d{1,2}"),
    ("05", "ss", "ss", "\\d{1,2}"),
    ("06", "yy", "yy", "\\d{2}"),
    ("PM", "a", "a", "[APap][Mm]"),
    ("pm", "a", "a", "[APap][Mm]"),
    ("1", "M", "M", "\\d{1,2}"),
    ("2", "d", "d", "\\d{1,2}"),
    ("3", "h", "h", "\\d{1,2}"),
    ("4", "m", "m", "\\d{1,2}"),
    ("5", "s", "s", "\\d{1,2}")
  )

  /** Characters that are always literal in a Go layout. Anything else that
    * is not a known token is rejected (fail closed).
    */
  private def isLiteral(c: Char): Boolean =
    !c.isLetterOrDigit

  /** Shared layout walk: token hits via `onToken`, the trimmed-fraction
    * family (".9"+) via `onTrimmedFraction(nDigits)`, literals via
    * `onLiteral`; throws on untranslatable tokens unless `failOpen`
    * (shapeRegex wants None, not an exception).
    */
  private def walk(goLayout: String)(
      onToken: ((String, String, String, String)) => Unit,
      onTrimmedFraction: Int => Unit,
      onLiteral: Char => Unit,
      onUnknown: Int => Unit): Unit = {
    var i = 0
    while (i < goLayout.length) {
      if (goLayout.startsWith(".9", i)) {
        var n = 0
        while (i + 1 + n < goLayout.length && goLayout.charAt(i + 1 + n) == '9') n += 1
        onTrimmedFraction(n)
        i += 1 + n
      } else table.find { case (go, _, _, _) => goLayout.startsWith(go, i) } match {
        case Some(row) => onToken(row); i += row._1.length
        case None =>
          val c = goLayout.charAt(i)
          if (isLiteral(c) || c.isLetter) { onLiteral(c); i += 1 }
          else { onUnknown(i); i += 1 }
      }
    }
  }

  private def build(goLayout: String, pick: ((String, String, String, String)) => String): String = {
    val out = new StringBuilder
    walk(goLayout)(
      onToken = row => out.append(pick(row)),
      onTrimmedFraction = n => out.append("[.").append("S" * n).append("]"),
      onLiteral = c =>
        if (c == '\'') out.append("''")
        else if (c.isLetter) out.append('\'').append(c).append('\'')
        else out.append(c),
      onUnknown = i => throw new IllegalArgumentException(
        s"untranslatable Go time layout token at index $i in '$goLayout'"))
    out.toString
  }

  /** PARSE-context pattern (weekday tokens omitted — see class doc and
    * [[weekdayStrip]]). */
  def translate(goLayout: String): String = build(goLayout, _._2)

  /** FORMAT-context Column: pattern runs via `date_format`, space-padded
    * day tokens as lpad'd day columns, concatenated (class doc — Spark
    * can express neither Go's `_2` pad nor the JVM `p` modifier in a
    * pattern). A layout with no padded token collapses to the single
    * `date_format`.
    */
  def formatColumn(ts: org.apache.spark.sql.Column, goLayout: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{concat, date_format, lpad}
    val pieces = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Column]
    val acc = new StringBuilder
    def flushAcc(): Unit =
      if (acc.nonEmpty) { pieces += date_format(ts, acc.toString); acc.clear() }
    walk(goLayout)(
      onToken = row => row._1 match {
        case "_2" => flushAcc(); pieces += lpad(date_format(ts, "d"), 2, " ")
        case "__2" => flushAcc(); pieces += lpad(date_format(ts, "D"), 3, " ")
        case _ => acc.append(row._3)
      },
      // trimmed fractions keep the parse spelling here — formatting an
      // optional section prints it fixed-width; Go's trailing-zero trim
      // has no pattern equivalent (pre-existing bounded divergence)
      onTrimmedFraction = n => acc.append("[.").append("S" * n).append("]"),
      onLiteral = c =>
        if (c == '\'') acc.append("''")
        else if (c.isLetter) acc.append('\'').append(c).append('\'')
        else acc.append(c),
      onUnknown = i => throw new IllegalArgumentException(
        s"untranslatable Go time layout token at index $i in '$goLayout'"))
    flushAcc()
    if (pieces.size == 1) pieces(0) else concat(pieces.toSeq: _*)
  }

  /** When the layout carries weekday tokens, an anchored
    * `(pattern, replacement)` pair that removes the weekday name from the
    * INPUT before parsing (Go validates the name then ignores it; Spark
    * can't parse 'E' at all). The pattern is the FULL layout shape with
    * capture groups around the non-weekday spans and the replacement
    * re-emits exactly those groups, so only the weekday token *in its
    * layout position* is removed — an unanchored per-name replace would
    * strip every weekday substring anywhere in the value, corrupting e.g.
    * zone names ('America/Montevideo' → 'America/tevideo') into strings
    * Go would have parsed. A non-matching (malformed) input is left
    * unchanged and fails the downstream parse, same as Go.
    */
  def weekdayStrip(goLayout: String): Option[(String, String)] = {
    var hasWeekday = false
    var unknown = false
    val pat = new StringBuilder("^")
    val repl = new StringBuilder
    var groups = 0
    val span = new StringBuilder
    def flushSpan(): Unit = if (span.nonEmpty) {
      groups += 1
      pat.append('(').append(span).append(')')
      repl.append('$').append(groups)
      span.setLength(0)
    }
    walk(goLayout)(
      onToken = row => row._1 match {
        case "Monday" | "Mon" =>
          hasWeekday = true; flushSpan(); pat.append(row._4)
        case _ => span.append(row._4)
      },
      onTrimmedFraction = n => span.append(s"(?:\\.\\d{1,$n})?"),
      onLiteral = c => span.append(java.util.regex.Pattern.quote(c.toString)),
      onUnknown = _ => unknown = true)
    flushSpan()
    pat.append('$')
    if (!hasWeekday || unknown) None else Some((pat.toString, repl.toString))
  }

  /** Conservative shape regex for a Go layout: matches a SUPERSET of the
    * strings the GUARDED translated pattern can parse, so `rlike(shape)`
    * is a sound prefilter — a multi-format `date` action otherwise pays a
    * thrown-and-caught parse exception per row per non-matching format
    * (measured: the dominant cost of `q_date_parse`). Numeric fields use
    * loose widths, zone names a loose word class; weekday and numeric-
    * zone fields use Go's EXACT set (that strictness is what restores Go
    * semantics on the guarded path — class doc). `None` when the layout
    * contains anything the table can't loosely describe (caller then
    * parses unguarded — never wrong, just looser).
    */
  def shapeRegex(goLayout: String): Option[String] = {
    val out = new StringBuilder("^")
    var unknown = false
    walk(goLayout)(
      onToken = row => out.append(row._4),
      onTrimmedFraction = n => out.append(s"(?:\\.\\d{1,$n})?"),
      onLiteral = c => out.append(java.util.regex.Pattern.quote(c.toString)),
      onUnknown = _ => unknown = true)
    if (unknown) None else Some(out.append("$").toString)
  }
}
