package graft.sketch

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005): a d × w counter
  * lattice where every term increments one bucket per row via d
  * pairwise-independent hashes; `estimate(t) = min_i lattice(i,
  * h_i(t))` over-counts only by collisions, NEVER under-counts. The
  * streaming-fold standard for heavy-hitter / frequency estimation when
  * per-term state (a full `groupBy(term)`) is too big or must be
  * mergeable across corpora.
  *
  * Scale shape: state is the d·w lattice per partition partial —
  * CONSTANT in corpus size (the entire point of the sketch) — merged
  * associatively by element-wise sum, so one corpus scan with map-side
  * partials and a d·w-long shuffle ships the whole summary; no
  * per-term shuffle ever happens. Two corpora's sketches ADD, which is
  * what makes the sketch incremental (yesterday's sketch + today's
  * batch) where exact counts would re-scan history.
  *
  * All hash arithmetic is integer mod `P` = 1e9+7 with multipliers
  * small enough that every product fits in int64 — deliberately
  * replayable in ANSI SQL, which is how the DuckDB oracle re-derives
  * the identical lattice. The base hash folds BYTES; callers comparing
  * against a codepoint-folding replay must restrict terms to ASCII
  * (where the two agree).
  */
object CountMin {

  val P = 1000000007L

  /** Row-i affine hash constants: odd, nonzero, < 2¹⁴ so
    * `h · a(i) + b(i) < 2⁶² ` for h < P.
    */
  def a(i: Int): Long = 131L * i + 17L
  def b(i: Int): Long = 977L * i + 3L

  /** Polynomial byte fold, mod P. */
  def baseHash(term: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < term.length) { h = (h * 31L + (term(i) & 0xffL)) % P; i += 1 }
    h
  }

  def bucket(h: Long, i: Int, w: Int): Int = (((h * a(i) + b(i)) % P) % w).toInt

  /** The sketch as an aggregate column: `array<long>` of length d·w,
    * row-major.
    */
  def sketch(term: Column, d: Int, w: Int): Column =
    EU.column(CountMinAgg(EU.expression(term), d, w).toAggregateExpression())

  /** Point estimate against a COLLECTED sketch riding the plan as a
    * literal (the bloom-rails pattern: d·w ≤ ~1M longs ≈ 8 MB is the
    * sane ceiling). The hash is spelled with SQL arithmetic
    * (`aggregate` over the term's characters), so the expression is
    * engine-portable; ASCII-only terms keep it equal to the byte fold.
    */
  def estimate(term: Column, sk: Array[Long], d: Int, w: Int): Column = {
    require(sk.length == d * w, s"sketch length ${sk.length} != $d*$w")
    val h = aggregate(
      transform(sequence(lit(1), length(term)),
        i => ascii(substring(term, i, lit(1))).cast("long")),
      lit(0L).cast("long"), (acc, c) => (acc * 31L + c) % P)
    val perRow = (0 until d).map { i =>
      element_at(lit(sk), (((h * a(i) + b(i)) % P) % w + lit(i.toLong * w) + 1)
        .cast("int"))
    }
    least(perRow: _*)
  }
}

/** One-pass Count-Min accumulation — the [[graft.text.TrigramCounts]]
  * bounded-lattice aggregate shape with the CMS hash family.
  */
case class CountMinAgg(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(d >= 1 && d <= 16, s"depth $d out of range")
  require(w >= 2 && d.toLong * w <= (1 << 20),
    s"lattice $d x $w exceeds the 1M-slot plan-state ceiling")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"count_min requires a STRING child, got ${child.dataType.catalogString}")

  override def prettyName: String = "count_min"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val slots = d * w

  override def createAggregationBuffer(): Array[Long] = new Array[Long](slots)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = CountMin.baseHash(v.asInstanceOf[UTF8String].getBytes)
      var i = 0
      while (i < d) { buf(i * w + CountMin.bucket(h, i, w)) += 1L; i += 1 }
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

  /** Sparse wire form (int32 nonzero count, then int32 slot / int64
    * count pairs): a near-empty partition partial ships bytes, not the
    * dense lattice.
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
    while (nz > 0) { buf(bb.getInt()) = bb.getLong(); nz -= 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): CountMinAgg =
    copy(child = c)
}
