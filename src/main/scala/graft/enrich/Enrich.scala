package graft.enrich

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The enrich stage: broadcast lookup joins keyed on `role` / `tool`,
  * replacing the reference's per-stream `fields` decoration
  * (`lc-lib/event/stream.go:72-114`) and its LRU-cached lookup actions
  * (geoip `actiongeoip.go:88-168`, user_agent `actionuseragent.go:50-112`).
  * The lookup table is the whole "cache", shipped once per executor via
  * a broadcast hash join — no shuffle of the fact side, which is the only
  * join strategy that survives a 10^12-row fact table with a tiny dim.
  */
object Enrich {

  /** Left broadcast join; lookup columns land as top-level columns. */
  def withLookup(df: DataFrame, lookup: DataFrame, keys: Seq[String]): DataFrame =
    df.join(broadcast(lookup), keys, "left")

  /** Geoip-shaped variant (`actiongeoip.go:139-167`): the lookup's
    * non-key columns are folded into a single struct column `target`,
    * null when the key misses.
    */
  def withLookupStruct(df: DataFrame, lookup: DataFrame, keys: Seq[String],
      target: String): DataFrame = {
    val valueCols = lookup.columns.filterNot(keys.contains)
    val packed = lookup.select(
      keys.map(col) :+
        struct(valueCols.toIndexedSeq.map(col): _*).as(target): _*)
    df.join(broadcast(packed), keys, "left")
  }

  /** Default role lookup (FIXTURES.md §3). */
  def roleLookup(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("user", "product", 2),
      ("assistant", "model", 1),
      ("system", "platform", 0),
      ("tool", "infra", 3)
    ).toDF("role", "team", "priority")
  }

  /** Default tool lookup (FIXTURES.md §3). */
  def toolLookup(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("search", "sink_tools", "cheap"),
      ("code", "sink_tools", "expensive"),
      ("browser", "sink_tools", "expensive"),
      ("none", "sink_main", "free")
    ).toDF("tool", "sink_hint", "cost_class")
  }

  /** Static decoration constants — the `Decorate` analog for global
    * `fields` config (`event/stream.go:105-113`).
    */
  def withStaticFields(df: DataFrame, fields: Map[String, String]): DataFrame =
    fields.foldLeft(df) { case (d, (k, v)) => d.withColumn(k, lit(v)) }
}
