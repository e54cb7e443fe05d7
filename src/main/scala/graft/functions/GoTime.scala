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
