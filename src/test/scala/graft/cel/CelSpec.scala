package graft.cel

import graft.SparkTestBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mirrors `lc-lib/processor/cel_test.go` surface: field access, has(),
  * operators, coercion, string methods, map/filter macros.
  */
class CelSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    ("ERROR something bad", 42L, Seq("a", "b"), Map("k" -> "7")),
    ("info all fine", 7L, Seq("x"), Map.empty[String, String])
  ).toDF("message", "num", "tags", "fields")

  private def resolve(p: String): Column = p match {
    case "message" | "num" | "tags" => col(p)
    case other => element_at(col("fields"), other)
  }

  private def evalBool(src: String): Seq[Boolean] =
    df.select(coalesce(Cel.compile(src, resolve), lit(false))).as[Boolean].collect().toSeq

  test("has() on dynamic fields") {
    assert(evalBool("has(event.k)") == Seq(true, false))
  }

  test("comparisons and logic") {
    assert(evalBool("event.num > 10 && event.num != 43") == Seq(true, false))
    assert(evalBool("event.num == 7 || event.message.startsWith(\"ERROR\")") == Seq(true, true))
  }

  test("string methods") {
    assert(evalBool("event.message.startsWith(\"ERROR \")") == Seq(true, false))
    assert(evalBool("event.message.contains(\"fine\")") == Seq(false, true))
    assert(evalBool("event.message.matches(\"^[a-z]+ \")") == Seq(false, true))
    assert(evalBool("event.message.endsWith(\"bad\")") == Seq(true, false))
  }

  test("arithmetic and int coercion") {
    val got = df.select(Cel.compile("int(event.k) - 100", resolve)).as[java.lang.Long].collect()
    assert(got(0) == -93L && got(1) == null)
    val mul = df.select(Cel.compile("event.num * 100", resolve)).as[Long].collect()
    assert(mul.toSeq == Seq(4200L, 700L))
  }

  test("string concatenation with +") {
    val got = df.select(Cel.compile("\"prefix \" + event.message", resolve)).as[String].collect()
    assert(got(0) == "prefix ERROR something bad")
  }

  test("map macro on tags") {
    val got = df.select(Cel.compile("event.tags.map(tag, \"p_\" + tag)", resolve))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("p_a", "p_b"))
  }

  test("filter macro on tags") {
    val got = df.select(Cel.compile("event.tags.filter(tag, tag != \"a\")", resolve))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("b") && got(1) == Seq("x"))
  }

  test("ternary and size") {
    val got = df.select(Cel.compile("size(event.tags) > 1 ? \"many\" : \"few\"", resolve))
      .as[String].collect()
    assert(got.toSeq == Seq("many", "few"))
  }

  test("index access with brackets") {
    assert(evalBool("event[\"k\"] == \"7\"") == Seq(true, false))
  }

  test("null predicate treated as false by guards (ast.go:111-118)") {
    // comparing a missing field yields null, coalesced to false
    assert(evalBool("event.missing == \"x\"") == Seq(false, false))
  }

  test("int()/double() on a non-numeric string is an eval error → branch false, not fatal") {
    // Spark 4 defaults ANSI mode: a plain cast would throw
    // CAST_INVALID_INPUT on 'ERROR something bad'; the reference's CEL
    // eval error falsifies the branch (ast.go:111-118).
    assert(evalBool("int(event.message) > 0") == Seq(false, false))
    assert(evalBool("double(event.message) > 0.0") == Seq(false, false))
  }

  test("`in` membership operator over lists") {
    assert(evalBool("\"a\" in event.tags") == Seq(true, false))
    assert(evalBool("event.num in [7, 9]") == Seq(false, true))
    assert(evalBool("\"zzz\" in event.tags") == Seq(false, false))
  }

  test("int/int division truncates like cel-go; /0 nulls; typed doubles stay floating-point") {
    val typeOf: String => Option[org.apache.spark.sql.types.DataType] =
      p => if (p == "num") Some(org.apache.spark.sql.types.LongType) else None
    // 7/2 = 3 in cel-go (NOT 3.5): `event.num / 2 == 3` must route true
    assert(df.select(coalesce(
        Cel.compile("event.num / 2 == 3", resolve, typeOf), lit(false)))
      .as[Boolean].collect().toSeq == Seq(false, true))
    val d = df.select(Cel.compile("event.num / 4", resolve, typeOf))
      .as[Long].collect().toSeq
    assert(d == Seq(10L, 1L), s"integer division must truncate, got $d")
    // division by zero is an eval error -> null -> branch false
    assert(df.select(coalesce(
        Cel.compile("event.num / 0 == 0", resolve, typeOf), lit(false)))
      .as[Boolean].collect().forall(_ == false))
    // double literals keep floating-point division
    val f = df.select(Cel.compile("7.0 / 2.0", resolve)).as[Double].collect()(0)
    assert(f == 3.5)
  }

  test("NESTED integer arithmetic keeps cel-go truncating division (staticType recurses into Binary)") {
    val typeOf: String => Option[org.apache.spark.sql.types.DataType] =
      p => if (p == "num") Some(org.apache.spark.sql.types.LongType) else None
    // (event.num + 1) / 2: a Binary operand must still be seen as integral
    // — floating try_divide would give 21.5/4.0 doubles instead
    val r = df.select(Cel.compile("(event.num + 1) / 2", resolve, typeOf))
      .as[Long].collect().toSeq
    assert(r == Seq(21L, 4L), s"nested int arithmetic must stay integral, got $r")
    // chained division: 7/2/2 = 3/2 = 1 in cel-go (floating gives 1.75)
    val c = df.select(Cel.compile("7 / 2 / 2", resolve)).as[Long].collect()(0)
    assert(c == 1L, s"7/2/2 must truncate twice, got $c")
    // and the result type composes into comparisons / group keys
    val cmp = df.select(coalesce(
        Cel.compile("(event.num + 1) / 2 == 21", resolve, typeOf), lit(false)))
      .as[Boolean].collect().toSeq
    assert(cmp == Seq(true, false))
  }

  test("list indexing is 0-based like CEL; out-of-range and negative null out") {
    val typeOf: String => Option[org.apache.spark.sql.types.DataType] =
      p => if (p == "tags") Some(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)) else None
    val first = df.select(Cel.compile("event.tags[0]", resolve, typeOf))
      .as[String].collect().toSeq
    assert(first == Seq("a", "x"), s"tags[0] must be the FIRST element, got $first")
    val second = df.select(Cel.compile("event.tags[1]", resolve, typeOf))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(second == Seq(Some("b"), None), "out-of-range -> null, never wrong element")
    // no schema info + numeric key still means list semantics
    assert(df.select(Cel.compile("event.tags[0]", resolve))
      .as[String].collect()(0) == "a")
  }

  test("+ on two schema-typed string fields concatenates (never ANSI numeric add)") {
    val typeOf: String => Option[org.apache.spark.sql.types.DataType] =
      p => if (p == "message") Some(org.apache.spark.sql.types.StringType) else None
    val got = df.select(Cel.compile("event.message + event.message", resolve, typeOf))
      .as[String].collect()(0)
    assert(got == "ERROR something badERROR something bad")
  }

  test("substring/charAt/indexOf: negative or inverted indices null out (cel-go eval error), never mis-slice") {
    // the classic absent-needle idiom: indexOf -> -1, substring(-1) must
    // NOT return the whole string via substr's position-0 quirk
    val s1 = df.select(Cel.compile(
        "event.message.substring(event.message.indexOf(\"zzz\"))", resolve))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(s1.forall(_.isEmpty), s"substring(-1) must be null, got $s1")
    assert(df.select(Cel.compile("event.message.substring(2, 1)", resolve))
      .collect().forall(_.isNullAt(0)), "inverted range must be null")
    assert(df.select(Cel.compile("event.message.charAt(0 - 2)", resolve))
      .collect().forall(_.isNullAt(0)), "negative charAt must be null")
    assert(df.select(Cel.compile("event.message.indexOf(\"a\", 0 - 1)", resolve))
      .collect().forall(_.isNullAt(0)), "negative offset must be null")
    // in-range still slices 0-based
    assert(df.select(Cel.compile("event.message.substring(0, 5)", resolve))
      .as[String].collect()(0) == "ERROR")
  }

  test("truncated expressions fail with a CEL parse error, not an index exception") {
    val e1 = intercept[IllegalArgumentException](Cel.compile("event.num >", resolve))
    assert(e1.getMessage.contains("CEL"))
    val e2 = intercept[IllegalArgumentException](Cel.compile("size(", resolve))
    assert(e2.getMessage.contains("CEL"))
  }

  test("size() on strings counts code points; on collections counts elements (ext.Strings)") {
    val typeOf: String => Option[org.apache.spark.sql.types.DataType] =
      p => if (p == "message") Some(org.apache.spark.sql.types.StringType) else None
    val strLen = df.select(Cel.compile("size(event.message)", resolve, typeOf))
      .as[Int].collect().toSeq
    assert(strLen == Seq("ERROR something bad".length, "info all fine".length))
    val listLen = df.select(Cel.compile("size(event.tags)", resolve, typeOf))
      .as[Int].collect().toSeq
    assert(listLen == Seq(2, 1))
    // literal strings dispatch structurally, no schema needed; multi-byte
    // text counts CODE POINTS (CEL semantics), not bytes
    val cp = df.select(Cel.compile("size(\"héllo 日本\")", resolve))
      .as[Int].collect()(0)
    assert(cp == 8)
  }

  test("base64.encode/decode (ext.Encoders, cel.go:40-44)") {
    val enc = df.select(Cel.compile("base64.encode(event.message)", resolve))
      .as[String].collect()
    assert(enc(1) ==
      java.util.Base64.getEncoder.encodeToString("info all fine".getBytes("UTF-8")))
    val rt = df.select(Cel.compile(
      "string(base64.decode(base64.encode(event.message)))", resolve))
      .as[String].collect()
    assert(rt(0) == "ERROR something bad")
    assert(evalBool("base64.encode(event.message) == \"aW5mbyBhbGwgZmluZQ==\"")
      == Seq(false, true))
  }

  test("ext.Strings methods: charAt/indexOf/lastIndexOf (0-based CEL indices)") {
    val s = (src: String) => df.select(Cel.compile(src, resolve)).limit(1)
    assert(s("\"hello\".charAt(1)").as[String].collect()(0) == "e")
    assert(s("\"hello mellow\".indexOf(\"ello\")").as[Long].collect()(0) == 1L)
    assert(s("\"hello mellow\".indexOf(\"ello\", 2)").as[Long].collect()(0) == 7L)
    assert(s("\"hello mellow\".indexOf(\"zzz\")").as[Long].collect()(0) == -1L)
    assert(s("\"hello mellow\".lastIndexOf(\"ello\")").as[Long].collect()(0) == 7L)
    assert(s("\"hello mellow\".lastIndexOf(\"zzz\")").as[Long].collect()(0) == -1L)
    assert(evalBool("event.message.indexOf(\"ERROR\") == 0") == Seq(true, false))
  }

  test("ext.Strings methods: lowerAscii/upperAscii/replace/trim") {
    val s = (src: String) => df.select(Cel.compile(src, resolve)).limit(1)
    // ASCII-only case mapping (cel-go lowerAscii leaves non-ASCII alone)
    assert(s("\"TacoCÆt\".lowerAscii()").as[String].collect()(0) == "tacocÆt")
    assert(s("\"tacoCÆt\".upperAscii()").as[String].collect()(0) == "TACOCÆT")
    assert(s("\"hello hello\".replace(\"he\", \"we\")").as[String].collect()(0) == "wello wello")
    assert(s("\"a.b.c\".replace(\".\", \"-\")").as[String].collect()(0) == "a-b-c")
    // literal semantics: '$' in the replacement is not a backreference
    assert(s("\"cost: x\".replace(\"x\", \"$1\")").as[String].collect()(0) == "cost: $1")
    assert(s("\"  \\ttrim me \\n \".trim()").as[String].collect()(0) == "trim me")
  }

  test("ext.Strings methods: split/join/substring") {
    val s = (src: String) => df.select(Cel.compile(src, resolve)).limit(1)
    assert(s("\"a,b,,c\".split(\",\")").as[Seq[String]].collect()(0) == Seq("a", "b", "", "c"))
    assert(s("\"a.b.c\".split(\".\")").as[Seq[String]].collect()(0) == Seq("a", "b", "c"),
      "literal separator, not a regex")
    assert(s("[\"x\", \"y\"].join(\"-\")").as[String].collect()(0) == "x-y")
    assert(s("[\"x\", \"y\"].join()").as[String].collect()(0) == "xy")
    assert(s("\"tacocat\".substring(1)").as[String].collect()(0) == "acocat")
    assert(s("\"tacocat\".substring(1, 4)").as[String].collect()(0) == "aco")
    // composes with macros and size() structural dispatch
    assert(s("size(\"a b c\".split(\" \"))").as[Int].collect()(0) == 3)
    assert(s("size(\"a b c\".trim())").as[Int].collect()(0) == 5)
  }

  test("ext.Strings 3-arg replace(): bounded count, Go strings.Replace semantics") {
    val s = (src: String) => df.select(Cel.compile(src, resolve)).limit(1)
    assert(s("\"hello hello\".replace(\"he\", \"we\", 1)").as[String].collect()(0) == "wello hello")
    assert(s("\"hello hello\".replace(\"he\", \"we\", 0)").as[String].collect()(0) == "hello hello")
    // negative count = replace all; count beyond occurrences = all
    assert(s("\"aXbXc\".replace(\"X\", \"-\", -1)").as[String].collect()(0) == "a-b-c")
    assert(s("\"aXbXc\".replace(\"X\", \"-\", 9)").as[String].collect()(0) == "a-b-c")
    // trailing occurrence at the end of the string survives
    assert(s("\"aXbX\".replace(\"X\", \"-\", 2)").as[String].collect()(0) == "a-b-")
    // regex metacharacters are literal
    assert(s("\"a.b.c\".replace(\".\", \"-\", 1)").as[String].collect()(0) == "a-b.c")
    // non-overlapping left-to-right scan (Go: Replace("aaaa","aa","b",-1)="bb")
    assert(s("\"aaaa\".replace(\"aa\", \"b\", -1)").as[String].collect()(0) == "bb")
    // fully dynamic operands (column search / replacement / count)
    assert(s("event.message.replace(event.message, \"gone\", 1)")
      .as[String].collect()(0) == "gone")
    assert(s("\"x y\".replace(\" \", \"_\", int(event.k) - 106)") // -99 < 0 = all
      .as[String].collect()(0) == "x_y")
    // empty search = Go's insert-between-runes: before the first rune,
    // then after each, bounded by count; rune (not byte) boundaries
    assert(s("\"abc\".replace(\"\", \"-\", -1)").as[String].collect()(0) == "-a-b-c-")
    assert(s("\"abc\".replace(\"\", \"-\", 2)").as[String].collect()(0) == "-a-bc")
    assert(s("\"日本\".replace(\"\", \".\", -1)").as[String].collect()(0) == ".日.本.")
    assert(s("\"\".replace(\"\", \"x\", -1)").as[String].collect()(0) == "x")
    // cel-go type-checks count as int: a non-integer LITERAL fails at
    // compile (1.9 would silently truncate via cast, "x" would go NULL)
    intercept[IllegalArgumentException](
      Cel.compile("\"abc\".replace(\"a\", \"b\", 1.9)", resolve))
    intercept[IllegalArgumentException](
      Cel.compile("\"abc\".replace(\"a\", \"b\", \"x\")", resolve))
  }

  test("ext.Strings format(): literal format string, cel-go verb subset") {
    val s = (src: String) => df.select(Cel.compile(src, resolve)).limit(1)
    assert(s("\"%s=%d\".format([\"n\", 42])").as[String].collect()(0) == "n=42")
    assert(s("\"%.2f%%\".format([1.5])").as[String].collect()(0) == "1.50%")
    assert(s("\"%x|%X|%o\".format([255, 255, 8])").as[String].collect()(0) == "ff|FF|10")
    assert(s("\"msg=%s\".format([event.message])").as[String].collect()(0)
      == "msg=ERROR something bad")
    assert(s("\"plain, no verbs\".format([])").as[String].collect()(0) == "plain, no verbs")
    // composes as a string for + and size()
    assert(s("size(\"%d\".format([7]))").as[Int].collect()(0) == 1)
    // %b = Go strconv.FormatInt(v, 2), spliced as conv() segments around
    // the java.util.Formatter runs — NOT Formatter's boolean %b
    assert(s("\"%b\".format([5])").as[String].collect()(0) == "101")
    assert(s("\"%b\".format([0])").as[String].collect()(0) == "0")
    assert(s("\"%b\".format([-5])").as[String].collect()(0) == "-101")
    assert(s("\"m=%s b=%b h=%x %% tail=%b\".format([\"v\", 6, 255, 1])")
      .as[String].collect()(0) == "m=v b=110 h=ff % tail=1")
    // %% in an ARG-LESS segment between %b verbs must still render as
    // one percent sign (the splice can't emit that run as a bare literal)
    assert(s("\"%b %% done\".format([3])").as[String].collect()(0) == "11 % done")
    // Long.MinValue can't be negated in-range — pinned spelling (Go's
    // FormatInt(MinValue, 2) = "-1" + 63 zeros); built by arithmetic
    // because the lexer can't hold the bare literal
    assert(s("\"%b\".format([-9223372036854775807 - 1])").as[String].collect()(0)
      == "-1" + "0" * 63)
    // fail-closed cases: arity mismatch, precision on verbs where
    // java.util.Formatter rejects it (%.1d/%.1x would otherwise compile
    // and throw IllegalFormatPrecisionException per row at execution),
    // precision on %b
    intercept[IllegalArgumentException](Cel.compile("\"%s %s\".format([1])", resolve))
    intercept[IllegalArgumentException](Cel.compile("\"%.1d\".format([3])", resolve))
    intercept[IllegalArgumentException](Cel.compile("\"%.2x\".format([3])", resolve))
    intercept[IllegalArgumentException](Cel.compile("\"%.2b\".format([3])", resolve))
  }

  test("ext.Strings format(): dynamic format strings compile (cel.go:41 full Strings())") {
    val s = (src: String) => df.select(Cel.compile(src, resolve)).limit(1)
    // computed format string: verbs resolved per row by java.util.Formatter
    assert(s("(\"%s=\" + \"%d\").format([\"n\", 7])").as[String].collect()(0) == "n=7")
    // a field used AS the format string (no verbs → passes through)
    assert(s("event.message.format([])").as[String].collect()(0)
      == "ERROR something bad")
    // the literal path keeps compile-time validation; the dynamic path
    // still requires a LIST LITERAL of args (fixes the plan's arity)
    intercept[IllegalArgumentException](
      Cel.compile("event.message.format(1)", resolve))
  }

  test("ext.Strings quote(): Go strconv.Quote escaping") {
    val s = (src: String) => df.select(Cel.compile(src, resolve)).limit(1)
    assert(s("\"plain\".quote()").as[String].collect()(0) == "\"plain\"")
    assert(s("\"tab\\tnl\\n\".quote()").as[String].collect()(0) == "\"tab\\tnl\\n\"")
    assert(s("\"q\\\"b\\\\s\".quote()").as[String].collect()(0) == "\"q\\\"b\\\\s\"")
  }

  test("quote(): the FULL strconv.Quote table, not just the named escapes (expected values = Go outputs)") {
    def q(raw: String): String =
      df.select(org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.functions.GoQuote(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(lit(raw)))))
        .limit(1).as[String].collect()(0)
    // all seven lettered controls
    assert(q("\u0007\b\f\n\r\t\u000b") == "\"\\a\\b\\f\\n\\r\\t\\v\"")
    // other controls + DEL as \xNN — an ANSI color code must come out a
    // valid quoted literal, never raw ESC bytes
    assert(q("\u0000\u001b[31m\u007f") == "\"\\x00\\x1b[31m\\x7f\"")
    // printable non-ASCII raw; non-printable non-ASCII as \uNNNN
    assert(q("héllo 日本") == "\"héllo 日本\"")
    assert(q("a\u00a0b\u202ec") == "\"a\\u00a0b\\u202ec\"")
    // astral: printable raw, format-class escaped as \UNNNNNNNN
    assert(q("\ud83d\ude00") == "\"\ud83d\ude00\"") // U+1F600 😀
    assert(q(new String(Character.toChars(0xE0001))) == "\"\\U000e0001\"")
  }

  test("trim() strips Unicode whitespace like Go strings.TrimSpace") {
    val s = (src: String) => df.select(Cel.compile(src, resolve)).limit(1)
    // NBSP (U+00A0), EN QUAD (U+2000), IDEOGRAPHIC SPACE (U+3000), NEL (U+0085)
    val padded = "\"" + "\u00A0\u2000 x y\u3000\u0085" + "\".trim()"
    assert(s(padded).as[String].collect()(0) == "x y")
  }

  test("division and modulo by zero are eval errors → branch false, not fatal") {
    assert(evalBool("event.num / (event.num - event.num) > 0") == Seq(false, false))
    assert(evalBool("event.num % (event.num - event.num) == 0") == Seq(false, false))
    // sane divisions still work
    assert(evalBool("event.num / 2 > 10") == Seq(true, false))
    assert(evalBool("event.num % 2 == 0") == Seq(true, false))
  }
}
