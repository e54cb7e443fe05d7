package graft.codec

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's regex `PatternCollection`
  * (`lc-lib/codecs/patterncollection.go:39-95`): N patterns, each
  * optionally negated with a leading `!` or literal-escaped with a leading
  * `=`; `match: any` needs ≥1 pattern to pass, `all` needs all. A pattern
  * "passes" when `negate XOR matches`.
  */
final case class PatternCollection(patterns: Seq[String], matchMode: String = "any") {
  require(patterns.nonEmpty, "at least one pattern must be specified")
  require(matchMode == "any" || matchMode == "all", s"unknown match mode: $matchMode")

  /** (negate, regex) pairs after prefix stripping. */
  val parsed: Seq[(Boolean, String)] = patterns.map { p =>
    p.headOption match {
      case Some('!') => (true, p.substring(1))
      case Some('=') => (false, p.substring(1))
      case _         => (false, p)
    }
  }

  /** Declarative predicate — Catalyst codegen's `RLike` per pattern. */
  def predicate(c: Column): Column = {
    val per = parsed.map { case (neg, re) =>
      val m = c.rlike(re)
      if (neg) !m else m
    }
    if (matchMode == "all") per.reduce(_ && _) else per.reduce(_ || _)
  }

  /** Row-at-a-time form for the oracle / multiline sessioniser tests. */
  def matches(text: String): Boolean = {
    val results = parsed.map { case (neg, re) =>
      neg != java.util.regex.Pattern.compile(re).matcher(text).find()
    }
    if (matchMode == "all") results.forall(identity) else results.exists(identity)
  }
}

/** The `filter` codec (`lc-lib/codecs/filter/filter.go:86-105`): keep only
  * lines whose text passes the pattern collection. `filtered_lines`
  * metering becomes a count the caller can take on the complement.
  */
object FilterCodec {
  def keep(text: Column, patterns: Seq[String], matchMode: String = "any"): Column =
    PatternCollection(patterns, matchMode).predicate(text)
}
