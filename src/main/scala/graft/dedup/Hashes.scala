package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types._

/** Deterministic hash primitives shared by the dedup operators and their
  * test oracles. Self-contained (FNV-1a + splitmix64 + an md5-derived
  * 64-bit token hash) so the exact same signatures are computable
  * anywhere — the md5 form is additionally expressible in ANSI-ish SQL
  * (`CAST('0x' || substring(md5(w), 1, 16) AS UBIGINT)`), which is what
  * lets the SimHash pipeline be verified by an external SQL oracle.
  */
object Hashes {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  def fnv64(s: String): Long = fnv64(s.getBytes("UTF-8"))

  def fnv64(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }

  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of md5, big-endian — the same 64-bit value as parsing
    * the first 16 hex chars of the md5 text digest, so any engine with an
    * md5 function can reproduce it exactly.
    */
  def md5Hash64(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  def md5Hash64(s: String): Long = md5Hash64(s.getBytes("UTF-8"))

  /** MinHash signature of a set of strings: k independent permutation
    * mins via seed-mixed FNV hashes. Pure function; used by the
    * [[MinHashSig]] expression and the ScalaTest oracle.
    */
  def minHashSig(items: Iterator[String], k: Int): Array[Long] = {
    val seeds = minHashSeeds(k)
    val sig = Array.fill(k)(Long.MaxValue)
    while (items.hasNext) minHashAccum(fnv64(items.next()), seeds, sig)
    sig
  }

  def minHashSeeds(k: Int): Array[Long] =
    Array.tabulate(k)(i => mix64(i + 1L))

  def minHashAccum(h: Long, seeds: Array[Long], sig: Array[Long]): Unit = {
    var i = 0
    while (i < seeds.length) {
      val v = mix64(h ^ seeds(i))
      if (v < sig(i)) sig(i) = v
      i += 1
    }
  }

  /** 64-bit SimHash over a token multiset (unit weights). Token hash is
    * md5-derived ([[md5Hash64]]) so the whole fingerprint is reproducible
    * in SQL engines — see `QueriesML.qDedupSimhashSql`.
    */
  def simHash64(tokens: Iterator[String]): Long = {
    val acc = new Array[Int](64)
    while (tokens.hasNext) simHashAccum(md5Hash64(tokens.next()), acc)
    simHashFinish(acc)
  }

  def simHashAccum(h: Long, acc: Array[Int]): Unit = {
    var b = 0
    while (b < 64) {
      if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
      b += 1
    }
  }

  def simHashFinish(acc: Array[Int]): Long = {
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** MinHash signature as a single-pass Catalyst expression over a shingle
  * array — the scale-correct form: k×|shingles| mixes in one JVM loop
  * instead of k separate array traversals in the plan. Fully codegen'd
  * (participates in whole-stage codegen) and hashes the UTF-8 bytes
  * directly — no String round-trip per shingle.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"
  override val dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val seeds: Array[Long] = Hashes.minHashSeeds(k)

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): ArrayData = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      // skip NULL elements (containsNull arrays from upstream
      // expressions): collect-style semantics, not an NPE mid-codegen —
      // nullIntolerant only covers a top-level null ARRAY
      val e = arr.getUTF8String(j)
      if (e != null) Hashes.minHashAccum(Hashes.fnv64(e.getBytes), seeds, sig)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

object MinHashSig {
  def apply(c: Column, k: Int): Column =
    EU.column(MinHashSig(EU.expression(c), k))
}

/** 64-bit SimHash of a token array as one codegen'd expression. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override val dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = java.lang.Long.valueOf(compute(input))

  def compute(input: Any): Long = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = new Array[Int](64)
    var j = 0
    while (j < n) {
      // skip NULL elements — same contract as MinHashSig above
      val e = arr.getUTF8String(j)
      if (e != null) Hashes.simHashAccum(Hashes.md5Hash64(e.getBytes), acc)
      j += 1
    }
    Hashes.simHashFinish(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash64", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

object SimHash64 {
  def apply(c: Column): Column = EU.column(SimHash64(EU.expression(c)))
}
