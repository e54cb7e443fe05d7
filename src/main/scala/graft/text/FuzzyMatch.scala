package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy name matching — the record-linkage / entity-resolution
  * step of a data intake (resolve "blu widget" → "blue widget" before
  * grouping by entity; the reference's nearest analogue is the
  * pattern-driven field normalisation its grok/kv actions feed, which
  * cannot catch typos). Classic two-stage shape:
  *
  *  - resolution runs on the DISTINCT-NAME DICTIONARY with corpus
  *    frequencies, never on corpus rows (the dictionary is vocab-sized;
  *    the corpus joins back by exact key afterwards) — one aggregate
  *    plus dictionary-sized work;
  *  - candidate pairs come from UNION-OF-BLOCKING-KEYS (first-2 and
  *    last-2 characters): an edit at the head of a string escapes the
  *    prefix block but is caught by the suffix block and vice versa —
  *    the standard multi-pass blocking recall trade. An edit touching
  *    BOTH ends is missed by construction (disclosed); add key passes
  *    for more recall. Candidate cost is Σ block² over the dictionary —
  *    the blocking key is the scale/recall knob, and a skewed block is
  *    data skew the repo's salting pattern handles like any other key.
  *
  * Distance is plain Levenshtein (`functions.levenshtein` — codegen'd,
  * and the same classic DP DuckDB implements, so the oracle replays it
  * verbatim); `dist = 0` pairs are EXCLUDED — identical strings are
  * exact dedup's job, this operator exists for the typo band.
  */
object FuzzyMatch {

  /** Fuzzy pairs over the distinct values of `strCol` (lower/trim
    * canonicalised): `(name_a, name_b, dist, n_a, n_b)` with
    * `1 ≤ dist ≤ maxDist`, `name_a < name_b`, and each side's corpus
    * frequency — the n_b ≫ n_a direction is the "rare variant →
    * frequent canonical" resolution signal.
    */
  def fuzzyNamePairs(df: DataFrame, strCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1)
    val counts = df.select(lower(trim(col(strCol))).as("nm"))
      .filter(col("nm").isNotNull && length(col("nm")) >= 2)
      .groupBy("nm").agg(count(lit(1)).as("n"))
    val keyed = counts.select(col("nm"), substring(col("nm"), 1, 2).as("bk"))
      .unionByName(counts.select(col("nm"),
        substring(col("nm"), -2, 2).as("bk")))
      .distinct()
    val other = keyed.select(col("nm").as("nm2"), col("bk"))
    val pairs = keyed.join(other, keyed("bk") === other("bk") &&
        keyed("nm") < other("nm2"))
      .select(col("nm").as("name_a"), col("nm2").as("name_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") >= 1 && col("dist") <= maxDist)
    pairs
      .join(counts.select(col("nm").as("name_a"), col("n").as("n_a")), "name_a")
      .join(counts.select(col("nm").as("name_b"), col("n").as("n_b")), "name_b")
      .select(col("name_a"), col("name_b"), col("dist"), col("n_a"), col("n_b"))
  }
}
