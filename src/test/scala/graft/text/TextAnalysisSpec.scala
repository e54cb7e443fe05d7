package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c).collect()(0).get(0)

  test("whitespace and regex token counts") {
    assert(one("the quick brown fox", TextAnalysis.wsTokenCount($"text")) == 4)
    assert(one("", TextAnalysis.wsTokenCount($"text")) == 0)
    assert(one("  a  b ", TextAnalysis.wsTokenCount($"text")) == 2)
    assert(one("ab12,cd", TextAnalysis.regexTokenCount($"text")) == 4) // ab 12 , cd
  }

  test("stopword ratio and quality bounds") {
    assert(one("the cat sat on the mat", TextAnalysis.stopwordRatio($"text")) == 2.0 / 6)
    val q = one("the cat sat on the mat", TextAnalysis.qualityScore($"text"))
      .asInstanceOf[Double]
    assert(q > 0.0 && q <= 1.0)
  }

  test("langId picks the marker-dominant language, unknown when no hits") {
    assert(one("the cat and the dog of war", TextAnalysis.langId($"text")) == "en")
    assert(one("el gato la casa de madrid", TextAnalysis.langId($"text")) == "es")
    assert(one("der hund und das haus", TextAnalysis.langId($"text")) == "de")
    assert(one("xyzzy plugh", TextAnalysis.langId($"text")) == "unknown")
  }

  test("fingerprint matches the local fold and is order-sensitive") {
    def local(text: String): Long = {
      val t = text.trim
      if (t.isEmpty) 7L
      else t.split("\\s+").foldLeft(7L)((acc, w) =>
        (acc * 31 + w.length * 17 + w.charAt(0).toLong) % 1000000007L)
    }
    for (t <- Seq("hello world", "world hello", "a", ""))
      assert(one(t, TextAnalysis.fingerprint($"text")) == local(t), s"fp($t)")
    assert(local("hello world") != local("world hello"))
  }
}
