package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PMI collocation mining: rank adjacent word pairs by pointwise
  * mutual information — the phrase-mining step of a training-data
  * pipeline (find "new york"-style units worth a single token before
  * tokenizer training; Mikolov et al. 2013 §4 use exactly this
  * count-ratio score for word2vec phrases).
  *
  * The score is kept INTEGER: PMI orders identically to
  * `c_xy·N / (c_x·c_y)`, and that ratio is materialised as
  * `(c_xy·N·10⁶) div (c_x·c_y)` — a BIGINT both engines compute
  * bit-identically (log() never runs, so no float divergence; the 10⁶
  * scale preserves 6 significant digits of ordering).
  *
  * Scale shape: unigram and bigram counts are each ONE corpus scan +
  * key-partitioned aggregation (bigrams come from a zip of the token
  * array with its own tail — a projection, not a self-join). The two
  * count joins are plain equi-joins on the word key — vocabulary-sized
  * relations, AQE-broadcastable when small. `minCount` prunes the
  * hapax tail BEFORE the joins, which is what bounds the scored
  * relation; the final top-k window runs over that bounded relation
  * (swap in the repo's `TopKSmallest` aggregate past vocabulary
  * scale).
  *
  * Overflow bound (disclosed, not silent): the score numerator is
  * `c_xy·N·10⁶`, exact while `c_xy·N < 2⁶³/10⁶ ≈ 9.2×10¹²` — e.g. a
  * 10⁹-token corpus with a 9×10³-count bigram. Past that, pre-scale
  * both counts (`c div 2ᵏ` on c_xy and N — the ORDER of scores is
  * unchanged for any common divisor) or drop the 10⁶ precision scale;
  * Spark's non-ANSI wrap would otherwise mis-rank silently while the
  * DuckDB replay errors, the worst possible disagreement.
  */
object Collocations {

  /** Top-`topK` bigrams by PMI over `textCol`, whitespace-tokenised;
    * only pairs whose BOTH tokens match `^[a-z]+$` count (ASCII
    * guard — byte fold equals codepoint fold for the SQL replay), and
    * only pairs seen at least `minCount` times are scored.
    * Output: `rank, w1, w2, c_xy, c_x, c_y, score`.
    */
  def pmiBigrams(docs: DataFrame, textCol: String, minCount: Int,
      topK: Int): DataFrame = {
    require(minCount >= 1 && topK >= 1)
    val word = "^[a-z]+$"
    val toks = docs.select(
      split(coalesce(col(textCol), lit("")), " ").as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .filter(col("w").rlike(word))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // N = total counted tokens: a scalar by construction (one long);
    // NULL sum = zero counted tokens (all-numeric/non-Latin corpus) —
    // the correct answer is an empty result, not an NPE
    val nRow = uni.agg(sum(col("c"))).head
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    val bi = toks.filter(size(col("t")) >= 2)
      .select(explode(expr(
        "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1)," +
          " (a, b) -> named_struct('w1', a, 'w2', b))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .filter(col("w1").rlike(word) && col("w2").rlike(word))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    val scored = bi
      .join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
      .withColumn("score",
        expr(s"(c_xy * ${n}L * 1000000L) div (c_x * c_y)"))
    val topW = Window.orderBy(col("score").desc, col("w1"), col("w2"))
    scored.withColumn("rank", row_number().over(topW))
      .filter(col("rank") <= topK)
      .select("rank", "w1", "w2", "c_xy", "c_x", "c_y", "score")
  }
}
