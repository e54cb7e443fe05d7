package graft.functions

import java.text.Normalizer

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Test => SCTest}

class NfcNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  // every non-ASCII char spelled as an escape: composed forms vs
  // combining sequences are the POINT of these tests, and must not be
  // silently re-normalized by an editor or tooling pass over the source
  private val Acute = "\u0301"     // combining acute
  private val Diaeresis = "\u0308" // combining diaeresis
  private val EAcute = "\u00E9"    // precomposed \u00E9

  private def nfc(s: String): String =
    Seq(s).toDF("t").select(NfcNormalize($"t")).collect()(0).getString(0)

  test("composes decomposed sequences; already-NFC text is unchanged") {
    assert(nfc("e" + Acute) == EAcute)
    assert(nfc("Ame" + Acute + "lie") == "Am" + EAcute + "lie")
    assert(nfc(EAcute) == EAcute) // fast path: already NFC
    assert(nfc("plain ascii 123") == "plain ascii 123")
    assert(nfc("") == "")
    // Hangul: conjoining jamo (U+1100 U+1161) compose to U+AC00 in NFC
    assert(nfc("\u1100\u1161") == "\uAC00")
  }

  test("null propagates") {
    val r = Seq[Option[String]](None).toDF("t")
      .select(NfcNormalize($"t")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("matches java.text.Normalizer on arbitrary strings (codegen path)") {
    val piece = Gen.oneOf("a", "e", Acute, Diaeresis, EAcute, "n\u0303",
      " ", "\u1100\u1161", "\uAC00", "z")
    val gen = Gen.listOf(piece).map(_.mkString)
    val prop = Prop.forAll(gen) { s =>
      nfc(s) == Normalizer.normalize(s, Normalizer.Form.NFC)
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop).passed)
  }

  test("interpreted and codegen'd unsafe projections agree with Normalizer") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, InterpretedUnsafeProjection, UnsafeProjection}
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val expr = NfcNormalize(BoundReference(0, StringType, nullable = true))
    val cg = UnsafeProjection.create(Seq(expr))
    val interp = InterpretedUnsafeProjection.createProjection(Seq(expr))
    for (s <- Seq("e" + Acute, EAcute, "Ame" + Acute + "lie zz" + Diaeresis,
        "", "\u1100\u1161 mixed " + EAcute + " text")) {
      val row = InternalRow(UTF8String.fromString(s))
      val want = Normalizer.normalize(s, Normalizer.Form.NFC)
      assert(cg(row).getUTF8String(0).toString == want, s"codegen($s)")
      assert(interp(row).getUTF8String(0).toString == want, s"interpreted($s)")
    }
  }
}
