package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Fuzzes [[GoStrReplace]]'s byte-wise scan against an independent
  * JVM-string reference implementation of Go `strings.Replace` —
  * multi-byte runes in haystack/needle/replacement, empty needles, and
  * the full count range (negative / zero / partial / beyond-occurrences).
  */
class GoStrReplaceSpec extends AnyFunSuite {

  private def expr(s: String, o: String, n: String, c: Long): String =
    GoStrReplace(
      Literal(UTF8String.fromString(s), StringType),
      Literal(UTF8String.fromString(o), StringType),
      Literal(UTF8String.fromString(n), StringType),
      Literal(c, LongType)).eval(null).asInstanceOf[UTF8String].toString

  /** Reference: Go strings.Replace on JVM strings (code-point walk for
    * the empty-old insertion case — Go inserts per RUNE, and a surrogate
    * pair is one rune).
    */
  private def goReplace(s: String, old: String, nw: String, n: Long): String = {
    if (n == 0) return s
    if (old.isEmpty) {
      val cps = s.codePoints().toArray
      val m = cps.length + 1
      val budget = if (n < 0 || n > m) m else n
      val sb = new StringBuilder
      var inserted = 0L
      if (inserted < budget) { sb ++= nw; inserted += 1 }
      cps.foreach { cp =>
        sb.appendAll(Character.toChars(cp))
        if (inserted < budget) { sb ++= nw; inserted += 1 }
      }
      sb.toString
    } else {
      val sb = new StringBuilder
      var i = 0
      var replaced = 0L
      while (i < s.length) {
        if ((n < 0 || replaced < n) && s.startsWith(old, i)) {
          sb ++= nw; replaced += 1; i += old.length
        } else { sb += s.charAt(i); i += 1 }
      }
      sb.toString
    }
  }

  private val runeSoup: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar.map(_.toString),
    Gen.const("é"), Gen.const("日"), Gen.const("🙂"), Gen.const(" "), Gen.const("ab")
  )).map(_.mkString)

  test("fuzz vs JVM reference: dynamic needles, counts, multi-byte runes") {
    val gen = for {
      s <- runeSoup
      o <- Gen.oneOf(runeSoup,
        // substrings of s: guaranteed hits incl. overlapping shapes
        Gen.choose(0, math.max(s.length - 1, 0)).flatMap(i =>
          Gen.choose(i, s.length).map(j =>
            if (s.isEmpty) "" else adjustToCodePoints(s, i, j))))
      n <- runeSoup
      c <- Gen.oneOf(Gen.const(-1L), Gen.const(0L), Gen.choose(1L, 5L), Gen.const(100L))
    } yield (s, o, n, c)
    val p = Prop.forAll(gen) { case (s, o, n, c) =>
      expr(s, o, n, c) == goReplace(s, o, n, c)
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p).passed)
  }

  // clamp (i, j) to code-point boundaries so the needle is valid UTF-16/UTF-8
  private def adjustToCodePoints(s: String, i0: Int, j0: Int): String = {
    var i = i0; var j = j0
    if (i > 0 && Character.isLowSurrogate(s.charAt(i))) i -= 1
    if (j < s.length && Character.isLowSurrogate(s.charAt(j))) j += 1
    if (i > j) i = j
    s.substring(i, j)
  }

  test("Go documentation examples") {
    assert(expr("oink oink oink", "k", "ky", 2) == "oinky oinky oink")
    assert(expr("oink oink oink", "oink", "moo", -1) == "moo moo moo")
  }

  private def exprBytes(s: Array[Byte], o: String, n: String, c: Long): Array[Byte] =
    GoStrReplace(
      Literal(UTF8String.fromBytes(s), StringType),
      Literal(UTF8String.fromString(o), StringType),
      Literal(UTF8String.fromString(n), StringType),
      Literal(c, LongType)).eval(null).asInstanceOf[UTF8String].getBytes

  test("empty-search insertion on INVALID UTF-8 sizes runes like Go utf8.DecodeRune") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val D = 0x2d // '-'
    def ins(s: Array[Byte], c: Long = -1L): Seq[Int] =
      exprBytes(s, "", "-", c).map(_ & 0xff).toSeq
    // stray continuation bytes: each its own 1-byte rune (NOT one run)
    assert(ins(b(0x80, 0x80)) == Seq(D, 0x80, D, 0x80, D))
    // truncated 3-byte lead: lead alone is a 1-byte RuneError, the
    // following continuation is another stray rune
    assert(ins(b(0xe6, 0x97)) == Seq(D, 0xe6, D, 0x97, D))
    // valid 3-byte rune (日 = E6 97 A5) followed by a stray continuation
    assert(ins(b(0xe6, 0x97, 0xa5, 0xa5)) ==
      Seq(D, 0xe6, 0x97, 0xa5, D, 0xa5, D))
    // overlong: E0 needs first continuation in A0..BF — three 1-byte runes
    assert(ins(b(0xe0, 0x80, 0x80)) == Seq(D, 0xe0, D, 0x80, D, 0x80, D))
    // surrogate range: ED A0 80 — first continuation must be <= 9F
    assert(ins(b(0xed, 0xa0, 0x80)) == Seq(D, 0xed, D, 0xa0, D, 0x80, D))
    // above U+10FFFF: F4 90 — first continuation must be <= 8F
    assert(ins(b(0xf4, 0x90, 0x80, 0x80)) ==
      Seq(D, 0xf4, D, 0x90, D, 0x80, D, 0x80, D))
    // invalid leads C0/C1/F5 are 1-byte runes
    assert(ins(b(0xc0, 0xaf)) == Seq(D, 0xc0, D, 0xaf, D))
    // budget still bounds the per-rune insertions
    assert(ins(b(0x80, 0x80), c = 2L) == Seq(D, 0x80, D, 0x80))
  }
}
