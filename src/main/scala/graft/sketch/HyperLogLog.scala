package graft.sketch

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog (Flajolet et al. 2007) distinct-count sketch: 2^p
  * registers, register j holds the max "rank" (leading-zero count + 1)
  * of any element hashing to bucket j. State is 2^p bytes REGARDLESS
  * of cardinality, merge is element-wise max — so sketches of two
  * corpora COMBINE to the sketch of their union (the property exact
  * `count distinct` fundamentally lacks: its partials are
  * cardinality-sized sets). Spark's own `approx_count_distinct` is
  * HLL++ behind an opaque binary; this one exists so the REGISTERS are
  * a driver-checkable integer lattice: the hash family is the same
  * mod-P affine arithmetic as [[CountMin]], and rank is derived from
  * the integer bit-length (`31 − bitlen(v)`, replayed in SQL as
  * `len(bin(v))`), so an oracle re-derives every register bit-for-bit.
  *
  * The price of SQL replayability: `v` is uniform on [0, P) rather
  * than a power-of-two range (P = 1e9+7 ≈ 2^29.9), which biases rank
  * probabilities a few percent vs ideal HLL — the REGISTERS (the
  * driver contract) are exactly deterministic, and [[estimate]] with
  * the standard α_m correction still lands within the ~1.04/√m band
  * in practice (spec-checked at ±15 %).
  */
object HyperLogLog {

  import CountMin.P

  /** The sketch as an aggregate column: `array<int>` of 2^p register
    * ranks.
    */
  def sketch(term: Column, p: Int): Column =
    EU.column(HllAgg(EU.expression(term), p).toAggregateExpression())

  /** Two squaring rounds mod P — NONLINEAR mixing the estimator needs.
    * The Count-Min affine rows are fine for counting (one-sided error
    * only widens with collisions) but useless as an HLL hash: the
    * byte-polynomial base hash leaves short/similar strings on a
    * low-dimensional lattice, and an affine map carries lattices to
    * lattices — measured 35 distinct buckets for 100 distinct terms.
    * Squaring mod a prime scatters a lattice (quadratic residues have
    * no affine structure); with two rounds the bucket occupancy matches
    * the ideal birthday curve and estimates land at 3–8 % error
    * (m = 256). Every intermediate is < 2^60 — exact in int64 SQL,
    * which is what keeps the oracle replay possible.
    */
  def mix(h: Long, i: Int): Long = {
    var x = (h + 1000033L * i + 999983L) % P
    x = (x * x + 101L * i + 103L) % P
    x = (x * x + x + 7919L * i) % P
    x
  }

  /** (bucket, rank) of one hashed element — the single place the
    * mapping is defined; the oracle replays this arithmetic.
    */
  def bucketRank(h: Long, m: Int): (Int, Int) = {
    val j = (mix(h, 1) % m).toInt
    val v = mix(h, 2)
    val rank = if (v == 0L) 31 else 31 - (64 - java.lang.Long.numberOfLeadingZeros(v))
    (j, rank)
  }

  /** Standard HLL estimate with the small-range (linear counting)
    * correction — a driver-side convenience over the registers; the
    * registers themselves are the verified artifact.
    */
  def estimate(registers: Array[Int]): Double = {
    val m = registers.length
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var denom = 0.0
    var zeros = 0
    registers.foreach { r =>
      denom += math.pow(2.0, -r)
      if (r == 0) zeros += 1
    }
    val e = alpha * m * m / denom
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }
}

/** One-pass HLL accumulation: bounded byte-per-register state, max
  * merge. The [[CountMinAgg]] lattice shape with max instead of sum.
  */
case class HllAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Byte]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"precision $p out of range 4..16")
  private val m = 1 << p

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hll requires a STRING child, got ${child.dataType.catalogString}")

  override def prettyName: String = "hll"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: org.apache.spark.sql.catalyst.InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = CountMin.baseHash(v.asInstanceOf[UTF8String].getBytes)
      val (j, rank) = HyperLogLog.bucketRank(h, m)
      if (rank > buf(j)) buf(j) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): HllAgg =
    copy(child = c)
}
