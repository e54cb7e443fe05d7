package graft.text

import graft.SparkTestBase

class CollocationsSpec extends SparkTestBase {
  import spark.implicits._

  test("PMI ranking: exclusive pairs outrank pairs of promiscuous words; counts are exact") {
    // "new york" always adjacent and exclusive; "the cat"/"the dog" share "the"
    val docs = (Seq.fill(4)("new york") ++ Seq.fill(4)("the cat") ++
      Seq.fill(4)("the dog") ++ Seq("york the")).toDF("text")
    val out = Collocations.pmiBigrams(docs, "text", minCount = 4, topK = 10)
      .select("rank", "w1", "w2", "c_xy", "c_x", "c_y", "score")
      .as[(Int, String, String, Long, Long, Long, Long)].collect().toList
    // unigrams: new 4, york 5, the 9, cat 4, dog 4 → N = 26
    // scores: (c_xy·N·1e6) div (c_x·c_y)
    val nTotal = 26L
    def s(cxy: Long, cx: Long, cy: Long) = cxy * nTotal * 1000000L / (cx * cy)
    assert(out == List(
      (1, "new", "york", 4L, 4L, 5L, s(4, 4, 5)),    // 5_200_000
      (2, "the", "cat", 4L, 9L, 4L, s(4, 9, 4)),     // 2_888_888
      (3, "the", "dog", 4L, 9L, 4L, s(4, 9, 4))))    // tie broken by w2 asc
    // "york the" seen once < minCount: pruned
    assert(!out.exists(r => r._2 == "york"))
  }

  test("non-ASCII and sub-minCount tokens break adjacency pairs, empty text is safe") {
    val docs = Seq("héllo world héllo world", "", null.asInstanceOf[String],
      "a b a b a b a b").toDF("text")
    val out = Collocations.pmiBigrams(docs, "text", minCount = 3, topK = 10)
      .select("w1", "w2", "c_xy").as[(String, String, Long)].collect().toList
    // "héllo world" pairs are dropped (non-ASCII side); only a↔b bigrams survive
    assert(out.map(r => (r._1, r._2)).toSet == Set(("a", "b"), ("b", "a")))
    assert(out.find(r => r._1 == "a").get._3 == 4L)
    assert(out.find(r => r._1 == "b").get._3 == 3L)
  }

  test("a corpus with zero ASCII words yields an empty result, not a crash") {
    import spark.implicits._
    val docs = Seq("123 456", "ÉÀÜ ÖÏ", "").toDF("text")
    assert(graft.text.Collocations.pmiBigrams(docs, "text",
      minCount = 1, topK = 10).count() == 0)
  }
}
