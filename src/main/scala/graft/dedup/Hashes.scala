package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic hash primitives shared by the dedup operators and their
  * test oracles. Self-contained (FNV-1a + splitmix64) so the exact same
  * signatures are computable anywhere — no dependence on engine-specific
  * hash functions.
  */
object Hashes {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  def fnv64(s: String): Long = {
    val bytes = s.getBytes("UTF-8")
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

  /** MinHash signature of a set of strings: k independent permutation
    * mins via seed-mixed FNV hashes. Pure function; used by the
    * [[MinHashSig]] expression and the ScalaTest oracle.
    */
  def minHashSig(items: Iterator[String], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    while (items.hasNext) {
      val h = fnv64(items.next())
      var i = 0
      while (i < k) {
        val v = mix64(h ^ mix64(i + 1L))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** 64-bit SimHash over a token multiset (unit weights). */
  def simHash64(tokens: Iterator[String]): Long = {
    val acc = new Array[Int](64)
    while (tokens.hasNext) {
      val h = fnv64(tokens.next())
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** MinHash signature as a single-pass Catalyst expression over a shingle
  * array — the scale-correct form: k×|shingles| mixes in one JVM loop
  * instead of k separate array traversals in the plan.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"
  override val dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val it = (0 until n).iterator.map(i => arr.getUTF8String(i).toString)
    new GenericArrayData(Hashes.minHashSig(it, k).map(Long.box: Long => Any))
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

object MinHashSig {
  def apply(c: Column, k: Int): Column =
    EU.column(MinHashSig(EU.expression(c), k))
}

/** 64-bit SimHash of a token array as one expression. */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override val dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val it = (0 until n).iterator.map(i => arr.getUTF8String(i).toString)
    java.lang.Long.valueOf(Hashes.simHash64(it))
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

object SimHash64 {
  def apply(c: Column): Column = EU.column(SimHash64(EU.expression(c)))
}
