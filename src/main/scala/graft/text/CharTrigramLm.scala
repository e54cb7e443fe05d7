package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CCNet-style language-model quality filtering (Wenzek et al. 2020,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data" — the perplexity-filter stage every CommonCrawl pipeline runs):
  * a character-trigram LM with add-one smoothing, trained on a reference
  * corpus, scores each document by mean log10 P(c₃ | c₁c₂).
  *
  * Scale shape: the model is bounded by the NORMALIZED alphabet cubed
  * (29³ ≈ 24k trigrams), not by the corpus — so training is one bounded
  * aggregation and the trained counts ride the scoring expression as
  * plan state (like [[graft.sim.NearestCells]]' centroid matrix): the
  * scoring pass is zero-shuffle, zero-join, one codegen'd walk per row.
  *
  * Text is first normalized to the bounded class alphabet
  * ([[CharTrigramLm.normalize]]): ASCII whitespace → ' ', digits → '0',
  * letters lowercased, every other run (punctuation, non-ASCII) → one
  * '_'. The run-collapse makes the class string identical whether an
  * engine counts UTF-16 units or codepoints — what keeps the DuckDB
  * oracle byte-exact on multilingual text.
  */
object CharTrigramLm {

  /** Normalized class alphabet size: a-z + '0' + ' ' + '_'. */
  val AlphabetSize = 29

  /** Normalization to the class alphabet (see class doc; RE2 ∩
    * java.regex dialect so oracles replay the patterns verbatim).
    * Order matters: whitespace first, then the non-alphanumeric RUN
    * collapse (before lowercasing, so `lower` only ever sees ASCII),
    * digits last.
    */
  def normalize(text: Column): Column =
    regexp_replace(
      lower(regexp_replace(
        regexp_replace(coalesce(text, lit("")), "\\s", " "),
        "[^a-zA-Z0-9 ]+", "_")),
      "[0-9]", "0")

  /** Train: trigram counts over the normalized reference corpus — ONE
    * bounded aggregation (≤ 29³ groups). Returns (trigram → count); the
    * bigram-prefix counts the conditional needs derive on the driver.
    */
  def train(ref: DataFrame, textCol: String): Map[String, Long] = {
    val s = normalize(col(textCol))
    val tris = when(length(s) >= 3,
        transform(sequence(lit(0), length(s) - 3), i => s.substr(i + 1, lit(3))))
      .otherwise(array().cast("array<string>"))
    ref.select(explode(tris).as("tri"))
      .groupBy("tri").agg(count(lit(1)).as("c"))
      .collect() // bounded: <= AlphabetSize^3 rows, never corpus-sized
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Bigram-prefix counts (cnt of trigrams starting with the bigram). */
  def prefixCounts(tri: Map[String, Long]): Map[String, Long] =
    tri.groupBy(_._1.substring(0, 2)).map { case (bi, m) => bi -> m.values.sum }

  /** Score column over NORMALIZED text: struct(n_tri, sum_logprob). */
  def score(normalized: Column, tri: Map[String, Long]): Column =
    EU.column(CharTrigramLogProb(EU.expression(normalized), tri, prefixCounts(tri)))
}

/** Per-row trigram walk: n_tri and Σ log10((cnt₃+1)/(cnt₂+V)) with
  * add-one smoothing over [[CharTrigramLm.AlphabetSize]]. Summation is
  * left-to-right in string order (deterministic per row); oracles
  * replaying the sum in SQL aggregate in unspecified order, so compare
  * at `round(…, 4)` like every float oracle in this repo.
  */
case class CharTrigramLogProb(child: Expression,
    tri: Map[String, Long], bi: Map[String, Long]) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_trigram_logprob"

  override val dataType: DataType = StructType(Seq(
    StructField("n_tri", LongType, nullable = false),
    StructField("sum_logprob", DoubleType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = math.max(s.length - 2, 0)
    var sum = 0.0
    var i = 0
    while (i < n) {
      val t = s.substring(i, i + 3)
      val c3 = tri.getOrElse(t, 0L)
      val c2 = bi.getOrElse(t.substring(0, 2), 0L)
      sum += math.log10((c3 + 1.0) / (c2 + CharTrigramLm.AlphabetSize.toDouble))
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, sum))
  }

  def evalInput(s: Any): AnyRef = nullSafeEval(s).asInstanceOf[AnyRef]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmScore", this, classOf[CharTrigramLogProb].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.evalInput($c);")
  }

  override protected def withNewChildInternal(c: Expression): CharTrigramLogProb =
    copy(child = c)
}
