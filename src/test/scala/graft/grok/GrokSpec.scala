package graft.grok

import graft.SparkTestBase
import graft.model.TranscriptGen
import org.apache.spark.sql.functions._

/** Mirrors the reference's grok test coverage
  * (`lc-lib/grok/grok_test.go`, `pattern_test.go`, `types_test.go`).
  */
class GrokSpec extends SparkTestBase {
  import spark.implicits._

  test("compile expands nested patterns into a single regex") {
    val g = new Grok()
    val c = g.compile("%{NUMBER:num}")
    assert(c.fields == Seq(GrokField("num", "g0", GrokHint.HString)))
    val m = c.pattern.matcher("abc -12.5 def")
    assert(m.find() && m.group("g0") == "-12.5")
  }

  test("type hints int and float") {
    val g = new Grok()
    val c = g.compile("%{NUMBER:a:int} %{NUMBER:b:float}")
    assert(c.fields.map(_.hint) == Seq(GrokHint.HInt, GrokHint.HFloat))
  }

  test("definition order is irrelevant (pending-compilation analog)") {
    val g = new Grok(loadDefaults = false)
    // TOP depends on MID which depends on LEAF, added out of order
    g.addPattern("TOP", "%{MID} end")
    g.addPattern("LEAF", "[0-9]+")
    g.addPattern("MID", "x%{LEAF:n}")
    val c = g.compile("%{TOP:all}")
    val byName = c.fields.map(f => f.name -> f.group).toMap
    val m = c.pattern.matcher("x42 end")
    assert(m.find())
    assert(m.group(byName("all")) == "x42 end")
    assert(m.group(byName("n")) == "42")
  }

  test("missing pattern reported") {
    val g = new Grok(loadDefaults = false)
    assert(g.missingPatterns("%{NOPE:x}") == Seq("NOPE"))
    intercept[IllegalArgumentException](g.compile("%{NOPE:x}"))
  }

  test("circular patterns rejected") {
    val g = new Grok(loadDefaults = false)
    g.addPattern("A", "%{B}")
    g.addPattern("B", "%{A}")
    intercept[IllegalArgumentException](g.compile("%{A:x}"))
  }

  test("pattern file lines") {
    val g = new Grok(loadDefaults = false)
    g.addPatternsFromLines(Iterator("# comment", "", "MYNUM [0-9]+", "MYPAIR %{MYNUM:a}-%{MYNUM:b}"))
    val c = g.compile("%{MYPAIR}")
    val m = c.pattern.matcher("7-9")
    assert(m.find() && m.group("g0") == "7" && m.group("g1") == "9")
  }

  test("local patterns shadow builtins") {
    val g = new Grok()
    val c = g.compile("%{NUMBER:n}", localPatterns = Map("NUMBER" -> "[a-z]+"))
    val m = c.pattern.matcher("hello 5")
    assert(m.find() && m.group("g0") == "hello")
  }

  test("builtin sanity: IPV4 HTTPDATE LOGLEVEL TIMESTAMP_ISO8601") {
    val g = new Grok()
    def full(name: String, s: String): Boolean =
      java.util.regex.Pattern.compile(g.compile(s"%{$name}").regex).matcher(s).matches()
    assert(full("IPV4", "192.168.0.1"))
    assert(!full("IPV4", "999.1.1.1"))
    assert(full("HTTPDATE", "12/Mar/2026:14:02:59 +0000"))
    assert(full("LOGLEVEL", "ERROR") && full("LOGLEVEL", "warn"))
    assert(full("TIMESTAMP_ISO8601", "2026-03-12T14:02:59Z"))
    assert(full("UUID", "01234567-89ab-cdef-0123-456789abcdef"))
  }

  test("GrokExtract on the nginx corpus: typed struct, no-match null") {
    val lines = Seq(
      TranscriptGen.nginxLine(42, 1, 2),
      "not an access line",
      TranscriptGen.nginxLine(42, 3, 4)
    ).toDF("text")
    val out = lines.select(GrokExtract($"text", Grok.NginxAccess).as("gx"))
      .select($"gx.client", $"gx.response", $"gx.bytes", $"gx.requesttime", $"gx".isNull.as("fail"))
      .collect()
    assert(out.length == 3)
    assert(!out(0).getBoolean(4) && out(1).getBoolean(4) && !out(2).getBoolean(4))
    // typed captures
    assert(out(0).getLong(1) >= 100 && out(0).getLong(1) < 600)
    assert(out(0).getLong(2) >= 0)
    assert(out(0).getDouble(3) >= 0.0)
    // cross-check against plain regex on the same line
    val line = TranscriptGen.nginxLine(42, 1, 2)
    assert(line.startsWith(out(0).getString(0)))
  }

  test("int conversion never fails — zero value (types.go:53-66)") {
    val g = new Grok(loadDefaults = false)
    g.addPattern("HUGE", "[0-9]{25}")
    val df = Seq("1111111111111111111111111").toDF("text")
    val out = df.select(GrokExtract($"text", "%{HUGE:n:int}", g).as("gx"))
      .select($"gx.n").as[Long].collect()
    assert(out.head == 0L) // overflow → zero value like the reference
  }

  test("GrokExtractMap returns string captures as a map") {
    val df = Seq("code=abc 17").toDF("text")
    val g = new Grok(loadDefaults = false)
    g.addPattern("W", "[a-z]+")
    g.addPattern("N", "[0-9]+")
    val out = df.select(GrokExtract.map($"text", "code=%{W:w} %{N:n}", g).as("m"))
      .select(element_at($"m", "w"), element_at($"m", "n")).collect().head
    assert(out.getString(0) == "abc" && out.getString(1) == "17")
  }

  test("missingPatterns is transitive: a present pattern referencing an absent one is a miss") {
    val g = new Grok(loadDefaults = false)
    g.addPattern("TOP", "%{ABSENT} tail")
    assert(g.missingPatterns("%{TOP:x}") == Seq("ABSENT"),
      "pre-flight must not give a false all-clear before compile throws")
    g.addPattern("ABSENT", "[a-z]+")
    assert(g.missingPatterns("%{TOP:x}").isEmpty)
  }

  test("malformed spec syntax fails closed at compile, not as a lazy executor regex error") {
    val g = new Grok(loadDefaults = false)
    g.addPattern("WORD", "\\w+")
    // the reference rejects the 4-part form at compile (grok.go SplitN);
    // SpecRe can't consume it, and verbatim %{...} in the regex would
    // only explode at first match on an executor
    val e = intercept[IllegalArgumentException](g.compile("%{WORD:a:b:c}"))
    assert(e.getMessage.contains("invalid grok spec"))
    intercept[IllegalArgumentException](g.compile("%{BAD-NAME}"))
  }
}
