package graft.index

import graft.SparkTestBase

class InvertedIndexSpec extends SparkTestBase {
  import spark.implicits._

  test("df is exact past the cap, duplicates collapse, postings are the sorted doc-id prefix") {
    val occ = Seq(
      (3L, "the"), (1L, "the"), (2L, "the"), (1L, "the"), // dup inside doc 1
      (9L, "fox"), (2L, "fox"),
      (7L, "hen")
    ).toDF("doc_id", "term")
    val out = InvertedIndex.build(occ, "doc_id", "term",
        postingCap = 2, topTerms = 10)
      .select("rank", "term", "df", "n_kept", "postings")
      .as[(Int, String, Long, Long, String)].collect().toList
    assert(out == List(
      // "the": df 3 (dup collapsed, cap does NOT bias df), postings capped to first 2
      (1, "the", 3L, 2L, "1,2"),
      // ties on df=2… "fox" df 2 beats "hen" df 1; postings sorted ascending
      (2, "fox", 2L, 2L, "2,9"),
      (3, "hen", 1L, 1L, "7")))
  }

  test("topTerms bounds the output; rank order is df desc then term asc") {
    val occ = (1L to 5L).flatMap(d => Seq((d, "a"), (d, "b"))) ++ Seq((1L, "z"))
    val out = InvertedIndex.build(occ.toDF("doc_id", "term"), "doc_id", "term",
        postingCap = 16, topTerms = 2)
      .select("rank", "term").as[(Int, String)].collect().toList
    assert(out == List((1, "a"), (2, "b"))) // "z" (df 1) cut by topTerms
  }
}
