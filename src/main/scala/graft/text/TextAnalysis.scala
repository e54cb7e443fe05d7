package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting. All
  * pure Column formulas (codegen'd, SQL-reproducible for the oracle).
  */
object TextAnalysis {

  val Stopwords = Seq("the", "a", "of", "to", "and", "in", "is", "it")

  /** Whitespace token count (empty text → 0). */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: word pieces, number runs, or single symbols. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Stopword ratio over whitespace tokens. */
  def stopwordRatio(text: Column): Column = {
    val words = split(trim(text), "\\s+")
    val stops = filter(words, w => w.isin(Stopwords: _*))
    when(size(words) === 0, lit(0.0))
      .otherwise(size(stops).cast("double") / size(words))
  }

  /** Alphabetic character ratio. */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise((length(text) - length(regexp_replace(text, "[A-Za-z]", "")))
        .cast("double") / length(text))

  /** Mean whitespace-token length. */
  def meanTokenLen(text: Column): Column = {
    val n = wsTokenCount(text)
    when(n === 0, lit(0.0))
      .otherwise((length(trim(text)) - (n - 1)).cast("double") / n)
  }

  /** Composite quality score in [0,1] — the length/punctuation/stopword
    * heuristic family used for corpus filtering (each component bounded
    * and deterministic).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(wsTokenCount(text).cast("double") / 100.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val alpha = alphaRatio(text)
    round((lenScore + stopScore + alpha) / 3.0, 4)
  }

  /** Language-ID heuristic: per-language marker-word hit counts, argmax
    * with deterministic tiebreak (marker order). Real systems use n-gram
    * models; the lattice here — score columns + greatest + chained when —
    * is the shape a model-based scorer compiles to.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "und", "das"),
    "fr" -> Seq("le", "et", "la")
  )

  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(m => size(regexp_extract_all(text, lit(s"\\b$m\\b"), lit(0))))
      .reduce(_ + _)

  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> langScore(text, ms) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldLeft(lit(null).cast("string")) { case (acc, (lang, s)) =>
      coalesce(acc, when(s === best && best > 0, lang))
    } match {
      case c => coalesce(c, lit("unknown"))
    }
  }

  /** Rolling polynomial fingerprint over whitespace tokens — order-
    * sensitive (unlike a bag-of-words hash), cheap, and reproducible in
    * ANSI SQL (`list_reduce`): fp = fold(tokens, 7, acc·31 + len(w)·17 +
    * first-char-code) mod 1e9+7.
    */
  def fingerprint(text: Column): Column = {
    val words = split(trim(text), "\\s+")
    when(length(trim(text)) === 0, lit(7L)).otherwise(
      aggregate(words, lit(7L),
        (acc, w) => (acc * 31 + length(w) * 17 + ascii(substring(w, 1, 1))) % 1000000007L))
  }
}
