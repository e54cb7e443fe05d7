package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
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
    * bounded aggregation via [[TrigramCounts]] (a 29³-slot dense-array
    * partial per task; each partial ships sparse). Returns (trigram →
    * count); the bigram-prefix counts the conditional needs derive on
    * the driver.
    *
    * This replaces the materialize-array-then-explode spelling
    * (`transform(sequence(...), substr)` → `explode` → `groupBy`), which
    * allocated an (L−2)-element array of 3-char UTF8String slices per
    * document BEFORE the aggregation ever saw a row — ~10k short-lived
    * objects for a 10 kB doc — and shuffled exploded rows. The aggregate
    * walks the normalized bytes in place, allocates nothing per trigram,
    * and its shuffle is one ≤29³-slot sparse buffer per task regardless
    * of corpus size.
    */
  def train(ref: DataFrame, textCol: String): Map[String, Long] = {
    val row = ref.select(TrigramCounts.column(normalize(col(textCol))).as("c")).head()
    val counts = row.getSeq[Long](0)
    val out = Map.newBuilder[String, Long]
    var i = 0
    while (i < counts.length) {
      if (counts(i) != 0L)
        out += (TrigramCounts.decodeTrigram(i) -> counts(i))
      i += 1
    }
    out.result()
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

/** One-pass bounded trigram counting over NORMALIZED text (input must be
  * [[CharTrigramLm.normalize]]d — the 29-char class alphabet, so the
  * UTF8String is pure ASCII and byte == char): each partial is a dense
  * `29³`-slot long array (~195 KB), updated in place with zero per-trigram
  * allocation; serialization ships only the non-zero (slot, count) pairs.
  * Model size is alphabet-bounded, never corpus-bounded — the
  * [[graft.functions.TopKSmallest]] buffer discipline applied to a dense
  * lattice. Evaluates to `array<long>` of all 29³ slots (bounded plan
  * output; the driver decodes non-zero slots to trigram strings).
  *
  * A byte outside the class alphabet (impossible post-normalize) counts
  * as '_' rather than corrupting an index — a defensive bound, not a
  * semantic path.
  */
case class TrigramCounts(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  import CharTrigramLm.AlphabetSize

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"trigram_counts requires a STRING child, got ${child.dataType.catalogString}")

  override def prettyName: String = "trigram_counts"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val slots = AlphabetSize * AlphabetSize * AlphabetSize

  override def createAggregationBuffer(): Array[Long] = new Array[Long](slots)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val n = s.numBytes() // normalized text is ASCII: bytes == chars
      if (n >= 3) {
        var c0 = TrigramCounts.classIndex(s.getByte(0))
        var c1 = TrigramCounts.classIndex(s.getByte(1))
        var i = 2
        while (i < n) {
          val c2 = TrigramCounts.classIndex(s.getByte(i))
          buf((c0 * AlphabetSize + c1) * AlphabetSize + c2) += 1L
          c0 = c1; c1 = c2
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < slots) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  /** Sparse wire form: int32 pair count, then (int32 slot, int64 count)
    * per non-zero slot — a near-empty partial ships a handful of bytes
    * instead of the 195 KB dense lattice.
    */
  override def serialize(buf: Array[Long]): Array[Byte] = {
    var nz = 0
    var i = 0
    while (i < slots) { if (buf(i) != 0L) nz += 1; i += 1 }
    val bb = java.nio.ByteBuffer.allocate(4 + nz * 12)
    bb.putInt(nz)
    i = 0
    while (i < slots) {
      if (buf(i) != 0L) { bb.putInt(i); bb.putLong(buf(i)) }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](slots)
    var nz = bb.getInt()
    while (nz > 0) {
      val slot = bb.getInt()
      buf(slot) = bb.getLong()
      nz -= 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TrigramCounts =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TrigramCounts =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): TrigramCounts =
    copy(child = c)
}

object TrigramCounts {
  import CharTrigramLm.AlphabetSize

  /** Class-alphabet index: a-z → 0..25, '0' → 26, ' ' → 27, '_' → 28. */
  def classIndex(b: Byte): Int = {
    val c = b & 0xff
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c == '0') 26
    else if (c == ' ') 27
    else 28 // '_' (and the defensive catch-all)
  }

  private val Chars: Array[Char] =
    (('a' to 'z') ++ Seq('0', ' ', '_')).toArray

  /** Inverse of the slot packing in [[TrigramCounts.update]]. */
  def decodeTrigram(slot: Int): String = {
    val c2 = Chars(slot % AlphabetSize)
    val c1 = Chars((slot / AlphabetSize) % AlphabetSize)
    val c0 = Chars(slot / (AlphabetSize * AlphabetSize))
    new String(Array(c0, c1, c2))
  }

  def column(c: Column): Column =
    EU.column(new TrigramCounts(EU.expression(c)).toAggregateExpression())
}
