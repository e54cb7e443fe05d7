package graft.route

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for heavy-hitter conversations (north rule: "handles
  * skewed conv_id partitions via salted repartitioning and AQE skew-join
  * splitting"; the generator plants ~1 % of conv_ids owning ~30 % of
  * turns).
  *
  * Catalyst's hash aggregate already does map-side partial aggregation,
  * which neutralises skew for algebraic aggregates (count/sum/min/max).
  * Salting matters for NON-combinable per-key operations — collect_list
  * style assembly, or a shuffle whose reduce-side key distribution is the
  * data distribution. These helpers implement the standard two-stage
  * salted shape; AQE skew-join splitting is additionally enabled in every
  * session this engine builds (`spark.sql.adaptive.skewJoin.enabled`).
  */
object Skew {

  /** Salt column: spreads one hot key over `salts` reducer partitions. */
  def salt(salts: Int, entropy: Column): Column =
    pmod(hash(entropy), lit(salts))

  /** Two-stage salted aggregation: per-(key, salt) partials, then final
    * combine per key. Equivalent to `df.groupBy(key).agg(count, sum)`
    * but the first shuffle spreads each hot key over `salts` partitions.
    */
  def saltedCounts(df: DataFrame, key: String, byteCol: String,
      salts: Int = 16): DataFrame =
    df.withColumn("_salt", salt(salts, col(byteCol)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_c"), sum(octet_length(col(byteCol))).as("_b"))
      .groupBy(col(key))
      .agg(sum(col("_c")).as("turns"), sum(col("_b")).as("bytes"))

  /** Salted repartition for per-conversation pipelines that only need
    * co-location at a later regrouping step (SURVEY.md §4): spread rows
    * of the same conversation across `salts` partitions for the
    * embarrassingly-parallel parse stage; the ordered window regroups
    * afterwards.
    */
  def saltedRepartition(df: DataFrame, key: String, salts: Int,
      numPartitions: Int, orderEntropy: Column): DataFrame =
    df.repartition(numPartitions, col(key), salt(salts, orderEntropy))
}
