package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — the
  * tokenizer-training step of an LLM data pipeline, shaped the way
  * industrial trainers shape it: ONE corpus scan builds the
  * word-frequency table, and every merge iteration runs on that
  * VOCABULARY relation (bounded by distinct words, not corpus size).
  * At 100 TB the corpus scan is the only corpus-sized job; the K merge
  * rounds are K small distributed aggregations over the vocab.
  *
  * Segmentations are space-padded symbol strings (`" c a t "`), and a
  * merge of pair (x, y) is a plain left-to-right non-overlapping
  * `replace(seg, " x y ", " xy ")` — the padding makes symbol
  * boundaries explicit, and sequential replace reproduces the
  * reference regex `(?<!\S)x y(?!\S)` convention on overlapping runs
  * (`" a a a "` → `" aa a "`). Pair counts are frequency-weighted and
  * count BOTH adjacencies of an overlapping run, exactly like the
  * reference counter. Ties break deterministically: count desc, then
  * (x, y) lexicographic — so the merge sequence is a pure function of
  * the corpus and every engine replaying the rule agrees bit-for-bit.
  */
object BpeTrainer {

  /** Learn the first `numMerges` merges over `textCol`, whitespace-
    * tokenised, ASCII-lowercase words only (byte fold == codepoint
    * fold for SQL replays). Output: `rank, a, b, merged, cnt` — one
    * row per merge in learned order; stops early if no pair remains.
    */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 1 && numMerges <= 64, s"numMerges out of range: $numMerges")
    val spark = docs.sparkSession
    // the one corpus-sized job: word frequencies
    val vocab0 = docs
      .select(explode(split(coalesce(col(textCol), lit("")), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      // AsciiSpacedChars == concat(' ', regexp_replace(w,'(.)','$1 '))
      // as a single byte pass (spec-pinned equal); the vocab is small
      // but the encode path shares the identical padding, so both
      // sides stay bit-aligned by construction
      .select(graft.functions.AsciiSpacedChars(col("w")).as("seg"), col("f"))
    // iterations run on the vocab relation; persist the base so the
    // replace chain re-derives from memory, not from the corpus
    vocab0.persist()
    var vocab = vocab0
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val top = vocab
        .select(col("f"), split(trim(col("seg")), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("f"), explode(expr(
          "zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1)," +
            " (x, y) -> named_struct('a', x, 'b', y))")).as("p"))
        .groupBy("p.a", "p.b").agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect() // bounded: one row
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((i + 1, a, b, cnt))
        vocab = vocab.withColumn("seg",
          expr(s"replace(seg, ' $a $b ', ' $a$b ')"))
        i += 1
      }
    }
    vocab0.unpersist()
    import spark.implicits._
    merges.toList.toDF("rank", "a", "b", "cnt")
      .select(col("rank"), col("a"), col("b"),
        concat(col("a"), col("b")).as("merged"), col("cnt"))
  }

  /** The APPLY face: tokenize with an already-learned merge list —
    * the shape that actually runs at 100 TB (training is rare, encode
    * is every-document). The merges ride the plan as a literal replace
    * chain over exploded words — plain string expressions, so the
    * whole per-word lattice stays inside WHOLE-STAGE CODEGEN (a
    * higher-order-function fold would evaluate interpreted — Spark
    * HOF lambdas are CodegenFallback), and the per-document
    * re-aggregation collapses map-side: a document's words are
    * consecutive after the Generate, so the one exchange carries ~one
    * partial row per document, not per word. `explode_outer` keeps
    * zero-ASCII-word documents in the output with (0, 0) counts.
    * Per-word segmentation is byte-identical to training's
    * (`" c a t "` padding, sequential left-to-right replaces in merge
    * order).
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.forall { case (a, b) =>
      a.matches("^[a-z]+$") && b.matches("^[a-z]+$") }, "non-ASCII merge symbol")
    // the padded segmentation via one byte-pass expression (spec-pinned
    // equal to the regexp_replace spelling) + the literal replace chain;
    // the token count is size(split(seg, ' ')) − 2 — the padded form
    // always has exactly one leading and one trailing space and single
    // interior separators, so the split yields tokens + 2 empty edge
    // elements. One reference to `seg` (the old trim+split spelling
    // also referenced it once; a spaces-count spelling would embed the
    // replace chain twice and double the cold plan/codegen cost)
    val seg = merges.foldLeft(graft.functions.AsciiSpacedChars(col("w"))) {
      case (c, (a, b)) => replace(c, lit(s" $a $b "), lit(s" $a$b "))
    }
    val ntok = (size(split(seg, " ", -1)) - 2).cast("long")
    docs.select(col(idCol),
        explode_outer(split(coalesce(col(textCol), lit("")), " ")).as("w"))
      // gate the merge chain on the word test: ntok is only CONSUMED
      // under isw, so non-word tokens (punctuation, numbers — routinely
      // a large slice of whitespace tokens on the every-document encode
      // path) skip the padding + N-replace chain instead of computing a
      // value the aggregate throws away
      .select(col(idCol), col("w").rlike("^[a-z]+$").as("isw"),
        when(col("w").rlike("^[a-z]+$"), ntok).otherwise(0L)
          .as("ntok"))
      .groupBy(col(idCol))
      .agg(sum(when(col("isw"), 1L).otherwise(0L)).as("n_words"),
        sum(col("ntok")).as("n_tokens"))
  }

  /** The SQL replay: the same word-frequency table, then `numMerges`
    * UNROLLED pair-count → argmax → rewrite rounds as a chained CTE
    * lattice (recursive CTEs cannot aggregate per SQL rules, so the
    * loop is spelled out). Every round's winning pair and count must
    * match [[learnMerges]] bit-for-bit.
    */
  def oracleSql(numMerges: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH wf AS (
             |  SELECT w, CAST(count(*) AS BIGINT) AS f FROM (
             |    SELECT unnest(string_split(coalesce(text, ''), ' ')) AS w
             |    FROM documents)
             |  WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w),
             |v0 AS (
             |  SELECT ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS seg, f
             |  FROM wf)""".stripMargin
    for (i <- 1 to numMerges) {
      sb ++= s""",
                |p$i AS (
                |  SELECT toks[CAST(k AS INT)] AS a, toks[CAST(k + 1 AS INT)] AS b,
                |    CAST(SUM(f) AS BIGINT) AS cnt
                |  FROM (SELECT f, string_split(trim(seg), ' ') AS toks FROM v${i - 1}),
                |    unnest(range(1, len(toks))) AS r(k)
                |  GROUP BY 1, 2),
                |m$i AS (SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
                |v$i AS (
                |  SELECT replace(seg, ' ' || m.a || ' ' || m.b || ' ',
                |                      ' ' || m.a || m.b || ' ') AS seg, f
                |  FROM v${i - 1}, m$i m)""".stripMargin
    }
    sb ++= "\n"
    sb ++= (1 to numMerges).map { i =>
      s"SELECT $i AS rank, a, b, a || b AS merged, cnt FROM m$i"
    }.mkString("", "\nUNION ALL\n", "\nORDER BY rank")
    sb.toString
  }

  /** SQL replay of the ENCODE face: re-learn the merges with the same
    * CTE lattice as [[oracleSql]], then re-apply all of them to every
    * document's words and emit per-document word/token counts. One
    * statement retrains AND re-tokenizes — agreement means training
    * and application both match.
    */
  def encodeOracleSql(numMerges: Int): String = {
    val train = oracleSql(numMerges)
    val trainCtes = train.substring(0, train.indexOf("\nSELECT 1 AS rank"))
    val sb = new StringBuilder(trainCtes)
    sb ++= """,
             |enc0 AS (
             |  SELECT doc_id, ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS seg
             |  FROM (
             |    SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS w
             |    FROM documents)
             |  WHERE regexp_matches(w, '^[a-z]+$'))""".stripMargin
    for (i <- 1 to numMerges) {
      sb ++= s""",
                |enc$i AS (
                |  SELECT doc_id, replace(seg, ' ' || m.a || ' ' || m.b || ' ',
                |                              ' ' || m.a || m.b || ' ') AS seg
                |  FROM enc${i - 1}, m$i m)""".stripMargin
    }
    sb ++= s"""
              |SELECT d.doc_id,
              |  CAST(count(e.seg) AS BIGINT) AS n_words,
              |  CAST(coalesce(SUM(len(string_split(trim(e.seg), ' '))), 0) AS BIGINT) AS n_tokens
              |FROM documents d LEFT JOIN enc$numMerges e ON e.doc_id = d.doc_id
              |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
    sb.toString
  }
}
