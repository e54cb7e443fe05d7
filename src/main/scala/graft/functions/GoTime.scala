package graft.functions

/** Translates Go `time` reference layouts (`Mon Jan 2 15:04:05 MST 2006`)
  * into JVM `DateTimeFormatter` patterns, so configs written for the
  * reference's `date` action (`lc-lib/processor/actiondate.go:60-95`) and
  * `%{+layout}` pattern strings (`lc-lib/event/pattern.go:74-81`) work
  * unchanged. Finite token table; **fails closed** on unknown tokens
  * (SURVEY.md §7 risk register).
  */
object GoTime {

  // longest-first so e.g. "2006" wins over "2" and "01" over "1"
  private val tokens: Seq[(String, String)] = Seq(
    "2006" -> "yyyy",
    "January" -> "MMMM",
    "Jan" -> "MMM",
    "Monday" -> "EEEE",
    "Mon" -> "EEE",
    ".000000000" -> ".SSSSSSSSS",
    ".000000" -> ".SSSSSS",
    ".000" -> ".SSS",
    "-07:00" -> "XXX",
    "-0700" -> "xx",
    "-07" -> "x",
    "Z07:00" -> "XXX",
    "Z0700" -> "XX",
    "Z07" -> "X",
    "MST" -> "zzz",
    "15" -> "HH",
    // day-of-year (Go layout "002": zero-padded; "__2": space-padded to 3)
    "002" -> "DDD",
    "__2" -> "[ ][ ]D",
    // space-padded day of month — the classic syslog "Jan _2 15:04:05"
    // layout; the optional-space section absorbs the pad for days 1-9
    "_2" -> "[ ]d",
    "01" -> "MM",
    "02" -> "dd",
    "03" -> "hh",
    "04" -> "mm",
    "05" -> "ss",
    "06" -> "yy",
    "PM" -> "a",
    "pm" -> "a",
    "1" -> "M",
    "2" -> "d",
    "3" -> "h",
    "4" -> "m",
    "5" -> "s"
  )

  /** Characters that are always literal in a Go layout. Anything else that
    * is not a known token is rejected (fail closed).
    */
  private def isLiteral(c: Char): Boolean =
    !c.isLetterOrDigit

  /** Conservative shape regex for a Go layout: matches a SUPERSET of the
    * strings the translated pattern can parse, so `rlike(shape)` is a
    * sound prefilter — a multi-format `date` action otherwise pays a
    * thrown-and-caught parse exception per row per non-matching format
    * (measured: the dominant cost of `q_date_parse`). Numeric fields use
    * loose widths, zone names a loose word class; `None` when the layout
    * contains anything the table can't loosely describe (caller then
    * parses unguarded — never wrong, just slower).
    */
  def shapeRegex(goLayout: String): Option[String] = {
    val shapes: Seq[(String, String)] = Seq(
      "2006" -> "\\d{4}",
      "January" -> "[A-Za-z]+", "Jan" -> "[A-Za-z]{3}",
      "Monday" -> "[A-Za-z]+", "Mon" -> "[A-Za-z]{3}",
      ".000000000" -> "\\.\\d{9}", ".000000" -> "\\.\\d{6}", ".000" -> "\\.\\d{3}",
      "-07:00" -> "[+-]\\d{2}:\\d{2}", "-0700" -> "[+-]\\d{4}", "-07" -> "[+-]\\d{2}",
      "Z07:00" -> "(?:Z|[+-]\\d{2}:\\d{2})", "Z0700" -> "(?:Z|[+-]\\d{4})",
      "Z07" -> "(?:Z|[+-]\\d{2})",
      "MST" -> "[A-Za-z][A-Za-z0-9/_+-]*",
      "15" -> "\\d{1,2}",
      "002" -> "\\d{1,3}", "__2" -> "\\s{0,2}\\d{1,3}", "_2" -> "\\s?\\d{1,2}",
      "01" -> "\\d{1,2}", "02" -> "\\d{1,2}", "03" -> "\\d{1,2}",
      "04" -> "\\d{1,2}", "05" -> "\\d{1,2}", "06" -> "\\d{2}",
      "PM" -> "[APap][Mm]", "pm" -> "[APap][Mm]",
      "1" -> "\\d{1,2}", "2" -> "\\d{1,2}", "3" -> "\\d{1,2}",
      "4" -> "\\d{1,2}", "5" -> "\\d{1,2}"
    )
    val out = new StringBuilder("^")
    var i = 0
    while (i < goLayout.length) {
      if (goLayout.startsWith(".9", i)) {
        var n = 0
        while (i + 1 + n < goLayout.length && goLayout.charAt(i + 1 + n) == '9') n += 1
        out.append(s"(?:\\.\\d{1,$n})?")
        i += 1 + n
      } else shapes.find { case (go, _) => goLayout.startsWith(go, i) } match {
        case Some((go, re)) => out.append(re); i += go.length
        case None =>
          val ch = goLayout.charAt(i)
          // mirror translate(): an unmatched letter is a quoted literal
          // (e.g. the ISO 'T'); an unmatched digit would be a layout
          // token we don't know — fail open (no guard, parse decides)
          if (ch.isDigit) return None
          out.append(java.util.regex.Pattern.quote(ch.toString))
          i += 1
      }
    }
    Some(out.append("$").toString)
  }

  def translate(goLayout: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < goLayout.length) {
      // trimmed fractional seconds ".9", ".99", … ".999999999": trailing
      // zeros removed when formatting, entire fraction optional when
      // parsing — an optional section around a variable fraction
      if (goLayout.startsWith(".9", i)) {
        var n = 0
        while (i + 1 + n < goLayout.length && goLayout.charAt(i + 1 + n) == '9') n += 1
        out.append("[.").append("S" * n).append("]")
        i += 1 + n
      } else
      tokens.find { case (go, _) => goLayout.startsWith(go, i) } match {
        case Some((go, jvm)) =>
          out.append(jvm); i += go.length
        case None =>
          val c = goLayout.charAt(i)
          if (isLiteral(c)) {
            // quote literal letters-adjacent chars that are JVM pattern
            // letters' neighbours; plain punctuation passes through
            if (c == '\'') out.append("''") else out.append(c)
            i += 1
          } else if (c.isLetter) {
            // a literal letter (e.g. the 'T' in ISO layouts) must be quoted
            out.append('\'').append(c).append('\'')
            i += 1
          } else {
            throw new IllegalArgumentException(
              s"untranslatable Go time layout token at index $i in '$goLayout'")
          }
      }
    }
    out.toString
  }
}
