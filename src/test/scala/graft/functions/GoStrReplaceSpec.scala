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
}
