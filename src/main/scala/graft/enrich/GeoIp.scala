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
    * `targetCol.targetField` (default `source[geo]`). On a successful
    * lookup the geo struct is MERGED into an existing struct target with
    * `withField`, preserving sibling fields (actiongeoip.go:139-162 sets
    * keys into the resolved target map, it never replaces the map); a
    * non-struct pre-existing target is replaced by a one-field struct
    * (documented divergence: a SQL column has one static type, where the
    * reference would error per event). Invalid IPs get BOTH the
    * `_geoip_failure` tag and the `_geoip_error` field (the `AddError`
    * convention, event.go:293-296); valid-but-unknown IPs are left
    * untouched. `ipFieldName` is the configured source-field name used in
    * the error text — the reference interpolates it
    * (actiongeoip.go:120: `Field '%s' is not a valid IP address`).
    */
  def enrich(df: DataFrame, ipCol: Column, lookup: DataFrame,
      targetCol: String = "source", targetField: String = "geo",
      ipFieldName: String = "ip"): DataFrame = {
    val joined = df
      .withColumn("_geoip_key", ipCol)
      .join(broadcast(lookup.withColumnRenamed("ip", "_geoip_key")),
        Seq("_geoip_key"), "left")
    val invalid = col("_geoip_key").isNotNull && !col("_geoip_key").rlike(Ipv4Re)
    val geoType = lookup.schema("_geo").dataType
    applyGeo(df, joined, invalid, geoType, targetCol, targetField, ipFieldName)
  }

  /** Enrich from a real MaxMind `.mmdb` database (GeoIP2/GeoLite2 City) —
    * the reference's native path (`actiongeoip.go:88-168`). No join at
    * all: a codegen'd per-row trie lookup against the per-JVM cached
    * reader ([[Mmdb.cached]]), so the only thing the plan carries is the
    * database PATH. IP validity follows `net.ParseIP` (v4 + v6), not the
    * join path's v4-only regex.
    */
  def enrichMmdb(df: DataFrame, ipCol: Column, dbPath: String,
      targetCol: String = "source", targetField: String = "geo",
      ipFieldName: String = "ip"): DataFrame = {
    val withGeo = df
      .withColumn("_geoip_key", ipCol)
      .withColumn("_geo", MmdbCityLookup(col("_geoip_key"), dbPath))
    val invalid = col("_geoip_key").isNotNull && !MmdbCityLookup.ipValid(col("_geoip_key"))
    applyGeo(df, withGeo, invalid, MmdbCityLookup.geoStructType,
      targetCol, targetField, ipFieldName)
  }

  /** Shared enrich tail: `joined` carries `_geoip_key` and `_geo`. */
  private def applyGeo(df: DataFrame, joined: DataFrame, invalid: Column,
      geoType: org.apache.spark.sql.types.DataType,
      targetCol: String, targetField: String, ipFieldName: String): DataFrame = {
    val target = df.schema.fields.find(_.name == targetCol) match {
      case Some(f) if f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType]
          && f.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
            .fieldNames.contains(targetField) =>
        // target struct already carries the field: only overwrite on a
        // successful lookup (branch types match — both have the field)
        when(col("_geo").isNotNull, col(targetCol).withField(targetField, col("_geo")))
          .otherwise(col(targetCol))
      case Some(f) if f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] =>
        // adding a new field: apply withField unconditionally so the
        // column type is uniform — a missed lookup leaves a null geo
        // field, siblings always preserved
        col(targetCol).withField(targetField, col("_geo"))
      case Some(_) =>
        when(col("_geo").isNotNull, struct(col("_geo").as(targetField)))
          .otherwise(struct(lit(null).cast(geoType).as(targetField)))
      case None =>
        when(col("_geo").isNotNull, struct(col("_geo").as(targetField)))
    }
    val tagged =
      if (joined.columns.contains(Envelope.TagsCol))
        joined.withColumn(Envelope.TagsCol,
          EventFns.withActionFailure(col(Envelope.TagsCol), invalid, "geoip"))
      else joined
    val errMsg = lit(s"Field '$ipFieldName' is not a valid IP address")
    val withErr =
      if (tagged.columns.contains(Envelope.FieldsCol))
        tagged.withColumn(Envelope.FieldsCol,
          when(invalid, graft.pipeline.Pipeline.mergeMaps(col(Envelope.FieldsCol),
            map(lit("_geoip_error"), errMsg)))
            .otherwise(col(Envelope.FieldsCol)))
      else
        tagged.withColumn("_geoip_error", when(invalid, errMsg))
    withErr
      .withColumn(targetCol, target)
      .drop("_geoip_key", "_geo")
  }
}
