package graft.enrich

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.EventFns
import graft.model.Envelope

/** The `geoip` action's semantic surface (`lc-lib/processor/actiongeoip.go:88-213`)
  * over a broadcast lookup table standing in for the MaxMind city database
  * (no mmdb reader in this sandbox; the mechanism — keyed lookup → struct
  * at a target path — is the real Spark design: the whole database ships
  * once per executor as a broadcast build side, which replaces the
  * reference's per-process LRU(1000)).
  *
  * Field set and behaviours mirrored exactly:
  *   - result struct fields `city_name, continent_name, country_iso_code,
  *     country_name, location [lon,lat], latitude, longitude, postal_code,
  *     timezone, region_iso_code, region_name` (actiongeoip.go:148-162);
  *   - default target `source[geo]` (configgeoip default);
  *   - invalid IP → `_geoip_error` field + `_geoip_failure` tag
  *     (actiongeoip.go:119-122 → event.AddError);
  *   - valid IP not in the database (GeoNameID 0) → silently ignored,
  *     no error (actiongeoip.go:134-137).
  */
final case class GeoRecord(
    ip: String,
    city_name: String, continent_name: String,
    country_iso_code: String, country_name: String,
    longitude: Double, latitude: Double,
    postal_code: String, timezone: String,
    region_iso_code: String, region_name: String)

object GeoIp {

  /** Dotted-quad with octet range check — `net.ParseIP` analog for v4. */
  val Ipv4Re = "^((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])$"

  /** The geo struct produced for one lookup row (column order matches
    * actiongeoip.go:148-162's field set).
    */
  private def geoStruct: Column = struct(
    col("city_name"), col("continent_name"),
    col("country_iso_code"), col("country_name"),
    array(col("longitude"), col("latitude")).as("location"),
    col("latitude"), col("longitude"),
    col("postal_code"), col("timezone"),
    col("region_iso_code"), col("region_name"))

  def lookupFrame(spark: SparkSession, db: Seq[GeoRecord]): DataFrame = {
    import spark.implicits._
    db.toDF().select(col("ip"), geoStruct.as("_geo"))
  }

  /** Broadcast-enrich `df` with the geo struct of `ipCol` at
    * `targetCol.targetField` (default `source[geo]`). Adds the failure
    * tag/error for syntactically invalid IPs; leaves valid-but-unknown
    * IPs untouched.
    */
  def enrich(df: DataFrame, ipCol: Column, lookup: DataFrame,
      targetCol: String = "source", targetField: String = "geo"): DataFrame = {
    val joined = df
      .withColumn("_geoip_key", ipCol)
      .join(broadcast(lookup.withColumnRenamed("ip", "_geoip_key")),
        Seq("_geoip_key"), "left")
    val invalid = col("_geoip_key").isNotNull && !col("_geoip_key").rlike(Ipv4Re)
    val target =
      if (joined.columns.contains(targetCol))
        when(col("_geo").isNotNull, struct(col("_geo").as(targetField)))
          .otherwise(col(targetCol))
      else
        when(col("_geo").isNotNull, struct(col("_geo").as(targetField)))
    val tagged =
      if (joined.columns.contains(Envelope.TagsCol))
        joined.withColumn(Envelope.TagsCol,
          EventFns.withActionFailure(col(Envelope.TagsCol), invalid, "geoip"))
      else joined
    tagged
      .withColumn(targetCol, target)
      .drop("_geoip_key", "_geo")
  }
}
