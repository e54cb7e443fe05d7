package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index construction: term → document frequency + a CAPPED,
  * sorted posting list — the search-index build step of a corpus
  * pipeline (the reference ships events into Elasticsearch,
  * `lc-lib/transports/es`, and leaves indexing to the sink; at corpus
  * scale the index build itself is a first-class distributed job).
  *
  * Scale rails, all by construction:
  *  - postings are CAPPED at `postingCap` ids per term BEFORE the
  *    collect (`row_number ≤ cap` over the term partition), so no
  *    stop-word ever materialises an unbounded array — the classic
  *    inverted-index OOM. The UNCAPPED document frequency is still
  *    exact (counted over the same partition before the cap).
  *  - the output is bounded to the `topTerms` highest-df terms, ranked
  *    deterministically (df desc, term asc). The final ranking window
  *    runs over the term-level relation (vocabulary-sized, not
  *    corpus-sized); at 100 TB swap it for the repo's bounded
  *    `TopKSmallest` aggregate — the per-term plan is unchanged.
  *  - per-term work is one `(term, doc)` distinct + one window over
  *    the term key: two key-partitioned exchanges, no self-join, no
  *    cross product.
  */
object InvertedIndex {

  /** Build from a `(docIdCol: long, termCol: string)` relation of
    * term occurrences (duplicates within a document are collapsed).
    * Output: `term, df, n_kept, postings` where `postings` is the
    * first `postingCap` doc ids ascending, comma-joined.
    */
  def build(occurrences: DataFrame, docIdCol: String, termCol: String,
      postingCap: Int, topTerms: Int): DataFrame = {
    require(postingCap >= 1 && topTerms >= 1)
    val pairs = occurrences
      .select(col(termCol).as("term"), col(docIdCol).as("doc_id"))
      .distinct()
    val termW = Window.partitionBy(col("term"))
    val rankW = termW.orderBy(col("doc_id"))
    val capped = pairs
      .withColumn("df", count(lit(1)).over(termW))
      .withColumn("_rk", row_number().over(rankW))
      .filter(col("_rk") <= postingCap)
      .groupBy(col("term"))
      .agg(max(col("df")).as("df"), count(lit(1)).as("n_kept"),
        array_join(transform(sort_array(collect_list(col("doc_id"))),
          x => x.cast("string")), ",").as("postings"))
    val topW = Window.orderBy(col("df").desc, col("term"))
    capped.withColumn("rank", row_number().over(topW))
      .filter(col("rank") <= topTerms)
      .select("rank", "term", "df", "n_kept", "postings")
  }
}
