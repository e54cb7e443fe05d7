package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Mirrors the reference kv FSM cases (`lc-lib/processor/actionkv.go`). */
class KvParseSpec extends SparkTestBase {
  import spark.implicits._

  test("simple pairs") {
    assert(KvParse.parse("a=1 b=2").toSeq == Seq("a" -> "1", "b" -> "2"))
  }

  test("quoted values with both quote styles and escapes kept raw") {
    assert(KvParse.parse("""k="two words" q='single'""").toSeq ==
      Seq("k" -> "two words", "q" -> "single"))
    // the escaped quote is skipped, so the value runs to the final quote,
    // escape char kept raw (the reference stores the raw slice)
    assert(KvParse.parse("""k='it\'s quoted'""").toSeq ==
      Seq("k" -> """it\'s quoted"""))
  }

  test("brackets stripped from names") {
    assert(KvParse.parse("[a][b]=v").toSeq == Seq("ab" -> "v"))
  }

  test("malformed: key with no name") {
    assert(KvParse.parse("=v a=1") == null)
  }

  test("malformed: unterminated quote") {
    assert(KvParse.parse("""a="unterminated""") == null)
  }

  test("malformed: text after closing quote") {
    assert(KvParse.parse("""a="v"x b=1""") == null)
  }

  test("malformed: dangling = at end (value state)") {
    // ends in kvStateValue → "unexpected end of field"
    assert(KvParse.parse("a=") == null)
  }

  test("trailing raw value kept; duplicate keys last-wins") {
    assert(KvParse.parse("a=1 a=2").toSeq == Seq("a" -> "1", "a" -> "2"))
  }

  test("column expression over a DataFrame") {
    val df = Seq(
      """alpha=1 beta="two words"""",
      """broken="x"""".dropRight(1), // unterminated
      "alpha=9 path=/x/y"
    ).toDF("text")
    val out = df.select(
      element_at(KvParse($"text"), "alpha").as("a"),
      KvParse($"text").isNull.as("failed")).collect()
    assert(out(0).getString(0) == "1" && !out(0).getBoolean(1))
    assert(out(1).isNullAt(0) && out(1).getBoolean(1))
    assert(out(2).getString(0) == "9" && !out(2).getBoolean(1))
  }

  test("property: well-formed unquoted pairs always round-trip") {
    val key = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
    val value = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val pairs = Gen.nonEmptyListOf(Gen.zip(key, value))
    val prop = Prop.forAll(pairs) { ps =>
      val line = ps.map { case (k, v) => s"$k=$v" }.mkString(" ")
      val parsed = KvParse.parse(line)
      parsed != null && parsed.toSeq == ps.map { case (k, v) => k -> v }
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop).passed)
  }
}
