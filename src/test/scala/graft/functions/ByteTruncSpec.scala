package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Byte-exact truncation properties with multi-byte inputs — the
  * `linereader.go:76-149` / `multiline.go:199-223` byte semantics that a
  * char-based substring gets wrong (VERDICT r1 §What's-wrong 5).
  */
class ByteTruncSpec extends AnyFunSuite {

  // strings mixing 1-, 2-, 3- and 4-byte UTF-8 sequences
  private val multiByteGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar.map(_.toString),
    Gen.const("é"), Gen.const("ß"),        // 2 bytes
    Gen.const("日"), Gen.const("本"),       // 3 bytes
    Gen.const("🙂"), Gen.const("𝄞"),        // 4 bytes (surrogate pairs)
    Gen.const(" ")
  )).map(_.mkString)

  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p).passed)

  private def trunc(s: String, max: Int): String =
    Utf8TruncBytes(Literal(UTF8String.fromString(s), StringType), max)
      .eval(null).asInstanceOf[UTF8String].toString

  private def chunks(s: String, max: Int): Seq[String] = {
    val arr = Utf8ChunkBytes(Literal(UTF8String.fromString(s), StringType), max)
      .eval(null).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  /** JVM reference: largest rune-complete prefix with ≤ max UTF-8 bytes. */
  private def refTrunc(s: String, max: Int): String = {
    var i = 0
    var bytes = 0
    val sb = new StringBuilder
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = new String(Character.toChars(cp)).getBytes(UTF_8).length
      if (bytes + n > max) return sb.toString
      sb.appendAll(Character.toChars(cp))
      bytes += n
      i += Character.charCount(cp)
    }
    sb.toString
  }

  test("property: trunc equals the JVM reference on multi-byte strings") {
    check(Prop.forAll(multiByteGen, Gen.choose(0, 40)) { (s, max) =>
      trunc(s, max) == refTrunc(s, max)
    })
  }

  test("property: trunc output is a valid-UTF-8, byte-bounded prefix") {
    check(Prop.forAll(multiByteGen, Gen.choose(0, 40)) { (s, max) =>
      val t = trunc(s, max)
      (t.getBytes(UTF_8).length <= max || t == s) &&
        new String(t.getBytes(UTF_8), UTF_8) == t &&
        s.startsWith(t)
    })
  }

  test("property: chunks reassemble to the input, each byte-bounded and valid") {
    check(Prop.forAll(multiByteGen, Gen.choose(4, 40)) { (s, max) =>
      val cs = chunks(s, max)
      cs.mkString == s &&
        cs.forall(_.getBytes(UTF_8).length <= max) &&
        cs.forall(c => new String(c.getBytes(UTF_8), UTF_8) == c)
    })
  }

  test("property: ASCII behaviour identical to the old char-based spelling") {
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.choose(1, 20)) { (s, max) =>
      trunc(s, max) == s.take(max)
    })
  }

  test("chunk trailing-empty rule matches the reference's zero-length remainder flush") {
    assert(chunks("", 5) == Seq(""))
    assert(chunks("aaaaa", 5) == Seq("aaaaa", ""))
    assert(chunks("aaaaaa", 5) == Seq("aaaaa", "a"))
    assert(chunks("aaaaaaaaaa", 5) == Seq("aaaaa", "aaaaa", ""))
  }

  test("byte cut backs off to the rune boundary, never splitting a code point") {
    // "ab日" = 1+1+3 bytes; cutting at 3 or 4 bytes must both yield "ab"
    assert(trunc("ab日", 3) == "ab")
    assert(trunc("ab日", 4) == "ab")
    assert(trunc("ab日", 5) == "ab日")
    // 4-byte emoji
    assert(trunc("🙂", 3) == "")
    assert(trunc("🙂", 4) == "🙂")
  }
}
