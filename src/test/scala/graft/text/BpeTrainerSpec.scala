package graft.text

import graft.SparkTestBase
import scala.collection.mutable

class BpeTrainerSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent reference BPE: list-of-symbols segmentation, pair
    * counts weighted by word frequency (both adjacencies of an
    * overlapping run), left-to-right non-overlapping merge, ties by
    * (count desc, pair lex asc).
    */
  private def refBpe(words: Map[String, Long], k: Int): List[(Int, String, String, String, Long)] = {
    def mergePair(syms: List[String], a: String, b: String): List[String] = {
      val buf = mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          buf += (a + b); i += 2
        } else { buf += syms(i); i += 1 }
      }
      buf.toList
    }
    var vocab = words.toList.map { case (w, f) => (w.map(_.toString).toList, f) }
    val out = mutable.ListBuffer.empty[(Int, String, String, String, Long)]
    var r = 1
    var done = false
    while (r <= k && !done) {
      val counts = mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; w <- syms.sliding(2) if w.size == 2)
        counts((w.head, w(1))) = counts.getOrElse((w.head, w(1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toList
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        out += ((r, a, b, a + b, c))
        vocab = vocab.map { case (syms, f) => (mergePair(syms, a, b), f) }
        r += 1
      }
    }
    out.toList
  }

  private def engine(texts: Seq[String], k: Int) =
    BpeTrainer.learnMerges(texts.toDF("text"), "text", k)
      .as[(Int, String, String, String, Long)].collect().toList.sortBy(_._1)

  private def wordFreq(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split(" ")).filter(_.matches("^[a-z]+$"))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }

  test("AsciiSpacedChars padding is byte-identical to the regexp_replace spelling") {
    import org.apache.spark.sql.functions._
    // the r8 encode fast path swapped concat(' ', regexp_replace(w,'(.)','$1 '))
    // for a single byte pass — pin equality on ASCII words, the empty
    // string, and multi-byte text (code-point semantics, incl. a
    // surrogate-pair emoji)
    val words = Seq("cat", "a", "", "lowest", "héllo", "日本語", "a😀b")
    val rows = words.toDF("w").select(
        graft.functions.AsciiSpacedChars(col("w")).as("fast"),
        concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")).as("regex"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"mismatch: '${r.getString(0)}' vs '${r.getString(1)}'"))
  }

  test("hand case: tie broken lexicographically, merges chain onto merged symbols") {
    val texts = Seq("low low lower", "lowest low")
    // (l,o) and (o,w) both weigh 5 → lex tie-break picks (l,o); then
    // (lo,w) = 5 chains onto the new symbol
    val got = engine(texts, 3)
    assert(got.take(2) == List(
      (1, "l", "o", "lo", 5L),
      (2, "lo", "w", "low", 5L)))
    assert(got == refBpe(wordFreq(texts), 3))
  }

  test("overlapping runs: both adjacencies count, merge is left-to-right non-overlapping") {
    val texts = Seq("aaa aaa")
    // 'aaa' ×2: (a,a) counts twice per word = 4; after the merge the
    // segmentation is [aa, a] (left-to-right), so round 2 is (aa, a) = 2
    val got = engine(texts, 2)
    assert(got == List(
      (1, "a", "a", "aa", 4L),
      (2, "aa", "a", "aaa", 2L)))
    assert(got == refBpe(wordFreq(texts), 2))
  }

  test("engine merges equal the independent reference on a mixed corpus") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quicker brown foxes jump over lazy dogs",
      "pack my box with five dozen liquor jugs",
      "the theory of the thermal theme", "Héllo MIXED çase ignored",
      "", "a ab abc abcd abcde")
    val got = engine(texts, 10)
    val want = refBpe(wordFreq(texts), 10)
    assert(got == want)
  }

  test("early stop when no pair remains") {
    val got = engine(Seq("a b c d"), 5) // all words single-symbol
    assert(got.isEmpty)
  }
}
