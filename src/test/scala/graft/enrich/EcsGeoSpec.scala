package graft.enrich

import graft.SparkTestBase
import graft.model.Envelope
import graft.pipeline.{GeoIpStage, Pipeline, SetFieldStage, UserAgentStage}
import org.apache.spark.sql.functions._

/** ECS envelope mode (`stream.go:35-45`, `docs/Events.md:16-45`), the
  * geoip semantic surface (`actiongeoip.go:88-213`) and the user_agent
  * pipeline stage (`actionuseragent.go:50-112`).
  */
class EcsGeoSpec extends SparkTestBase {
  import spark.implicits._

  private def base = Seq(
    ("c1", 0, "user", "hello", "none", new java.sql.Timestamp(1767225600000L)),
    ("c1", 1, "assistant", "world", "search", new java.sql.Timestamp(1767225601000L))
  ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("flat envelope: host/timezone/path/offset as top-level scalars (Events.md:16-27)") {
    val out = Ecs.decorate(base,
      EcsConfig(addHostField = true, addTimezoneField = true),
      host = lit("node1"), timezone = lit("+0000 UTC"), timezoneName = lit("UTC"),
      path = concat(lit("/transcripts/"), col("conv_id"), lit(".log")),
      offset = col("turn_idx"))
    val r = out.select("host", "timezone", "path", "offset").collect()(0)
    assert(r.getString(0) == "node1" && r.getString(1) == "+0000 UTC")
    assert(r.getString(2) == "/transcripts/c1.log" && r.getLong(3) == 0L)
    assert(!out.columns.contains("log") && !out.columns.contains("event"))
  }

  test("ECS envelope: nested host.name/hostname, event.timezone, log.file.path, log.offset (Events.md:31-45)") {
    val out = Ecs.decorate(base,
      EcsConfig(addHostField = true, addTimezoneField = true, enableEcs = true),
      host = lit("node1"), timezone = lit("+0000 UTC"), timezoneName = lit("UTC"),
      path = concat(lit("/transcripts/"), col("conv_id"), lit(".log")),
      offset = col("turn_idx"))
    val r = out.select(
      col("host.name"), col("host.hostname"), col("event.timezone"),
      col("log.file.path"), col("log.offset")).collect()(1)
    assert(r.getString(0) == "node1" && r.getString(1) == "node1")
    assert(r.getString(2) == "+0000 UTC")
    assert(r.getString(3) == "/transcripts/c1.log" && r.getLong(4) == 1L)
    // NOT backwards compatible: no flat columns in ECS mode
    assert(!out.columns.contains("path") && !out.columns.contains("timezone"))
  }

  test("add path field / add offset field toggles (harvester/config.go:31, codecs/stream.go:29)") {
    // flat mode, both off: no path/offset columns at all
    val flat = Ecs.decorate(base,
      EcsConfig(addPathField = false, addOffsetField = false),
      host = lit("n"), timezone = lit("z"), timezoneName = lit("Z"),
      path = lit("/p"), offset = col("turn_idx"))
    assert(!flat.columns.contains("path") && !flat.columns.contains("offset"))
    assert(flat.columns.contains("host"))
    // ECS mode, offset only: log = {offset}, no file.path
    val ecsOff = Ecs.decorate(base,
      EcsConfig(enableEcs = true, addPathField = false),
      host = lit("n"), timezone = lit("z"), timezoneName = lit("Z"),
      path = lit("/p"), offset = col("turn_idx"))
    val logType = ecsOff.schema("log").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(logType.fieldNames.toSeq == Seq("offset"))
    assert(ecsOff.select(col("log.offset")).collect()(1).getLong(0) == 1L)
    // ECS mode, both off: no log column
    val ecsNone = Ecs.decorate(base,
      EcsConfig(enableEcs = true, addPathField = false, addOffsetField = false),
      host = lit("n"), timezone = lit("z"), timezoneName = lit("Z"),
      path = lit("/p"), offset = col("turn_idx"))
    assert(!ecsNone.columns.contains("log"))
  }

  private val geoDb = Seq(
    GeoRecord("81.2.69.142", "London", "Europe", "GB", "United Kingdom",
      -0.0931, 51.5142, "EC1", "Europe/London", "ENG", "England"))

  test("geoip: known IP → full geo struct at source.geo (actiongeoip.go:148-162)") {
    val df = base.withColumn("ip", lit("81.2.69.142"))
    val out = GeoIp.enrich(df.withColumn(Envelope.TagsCol, array().cast("array<string>")),
      col("ip"), GeoIp.lookupFrame(spark, geoDb))
    val r = out.select(
      col("source.geo.city_name"), col("source.geo.country_iso_code"),
      col("source.geo.location"), col("source.geo.latitude"),
      col("source.geo.timezone"), col("source.geo.region_name"),
      array_join(col(Envelope.TagsCol), ",")).collect()(0)
    assert(r.getString(0) == "London" && r.getString(1) == "GB")
    assert(r.getSeq[Double](2) == Seq(-0.0931, 51.5142)) // [lon, lat]
    assert(r.getDouble(3) == 51.5142)
    assert(r.getString(4) == "Europe/London" && r.getString(5) == "England")
    assert(r.getString(6) == "") // no failure
  }

  test("geoip: valid-but-unknown IP is silently ignored; invalid IP tags _geoip_failure") {
    val df = Seq(("192.0.2.1", 0), ("999.1.2.3", 1), ("not an ip", 2)).toDF("ip", "i")
      .withColumn(Envelope.TagsCol, array().cast("array<string>"))
    val out = GeoIp.enrich(df, col("ip"), GeoIp.lookupFrame(spark, geoDb))
      .select(col("i"), col("source").isNull.as("no_geo"),
        array_join(col(Envelope.TagsCol), ",").as("tags"))
      .collect().map(r => r.getInt(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(out(0) == ((true, "")))                  // unknown: no struct, no error
    assert(out(1) == ((true, "_geoip_failure")))    // out-of-range octet
    assert(out(2) == ((true, "_geoip_failure")))    // not dotted-quad
  }

  test("geoip merges into an existing struct target, preserving sibling fields (actiongeoip.go:139-162)") {
    val df = Seq(("81.2.69.142", "10.0.0.1"), ("192.0.2.1", "10.0.0.2")).toDF("ip", "addr")
      .withColumn("source", struct(col("addr").as("address")))
      .withColumn(Envelope.TagsCol, array().cast("array<string>"))
    val out = GeoIp.enrich(df, col("ip"), GeoIp.lookupFrame(spark, geoDb))
      .select(col("ip"), col("source.address"), col("source.geo.city_name"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    // known IP: geo ADDED, sibling `address` untouched
    assert(out("81.2.69.142") == (("10.0.0.1", "London")))
    // unknown IP: struct untouched entirely (geo field null, sibling kept)
    assert(out("192.0.2.1") == (("10.0.0.2", null)))
  }

  test("geoip invalid IP sets the _geoip_error field alongside the failure tag (event.AddError)") {
    // with a fields map: the AddError convention writes into it
    val df = Seq(("999.1.2.3", 0), ("81.2.69.142", 1)).toDF("ip", "i")
      .withColumn(Envelope.TagsCol, array().cast("array<string>"))
      .withColumn(Envelope.FieldsCol,
        map(lit("keep"), lit("v")).cast("map<string,string>"))
    val out = GeoIp.enrich(df, col("ip"), GeoIp.lookupFrame(spark, geoDb))
      .select(col("i"), element_at(col(Envelope.FieldsCol), "_geoip_error").as("err"),
        element_at(col(Envelope.FieldsCol), "keep").as("keep"))
      .collect().map(r => r.getInt(0) -> ((r.getString(1), r.getString(2)))).toMap
    // byte-level fidelity with actiongeoip.go:120's fmt.Sprintf
    assert(out(0)._1 == "Field 'ip' is not a valid IP address")
    assert(out(0)._2 == "v", "existing fields survive the error merge")
    assert(out(1)._1 == null, "valid IPs get no error field")
    // without a fields map: a top-level _geoip_error column
    val df2 = Seq(("not an ip", 0)).toDF("ip", "i")
    val out2 = GeoIp.enrich(df2, col("ip"), GeoIp.lookupFrame(spark, geoDb))
    assert(out2.select("_geoip_error").collect()(0).getString(0).contains("not a valid IP"))
  }

  test("GeoIpStage respects guards and the source[geo] default target") {
    val df = base
    val out = Pipeline(df, Seq(
      SetFieldStage("ip", "\"81.2.69.142\""),
      GeoIpStage("ip", geoDb)))
    val cities = out.select(col("source.geo.city_name")).as[String].collect()
    assert(cities.toSeq == Seq("London", "London"))
  }

  test("UserAgentStage: fields-map entries and failure tag") {
    val df = Seq(
      ("c1", 0, "user", "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0", "none",
        new java.sql.Timestamp(0L)),
      ("c1", 1, "user", "curl/8.5.0", "none", new java.sql.Timestamp(1000L))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val out = Pipeline(df, Seq(UserAgentStage("text")))
    val rows = out.orderBy("turn_idx").select(
      element_at(col(Envelope.FieldsCol), "user_agent.name"),
      element_at(col(Envelope.FieldsCol), "user_agent.major"),
      element_at(col(Envelope.FieldsCol), "user_agent.os.family"),
      element_at(col(Envelope.FieldsCol), "user_agent.original")).collect()
    assert(rows(0).getString(0) == "Firefox" && rows(0).getString(1) == "121")
    assert(rows(0).getString(2) == "Linux")
    assert(rows(1).getString(0) == "curl" && rows(1).getString(3) == "curl/8.5.0")
    // absent version components are not set (conditional MustResolve)
    val ffPatch = out.filter(col("turn_idx") === 0)
      .select(map_contains_key(col(Envelope.FieldsCol), "user_agent.patch")).collect()(0)
    assert(!ffPatch.getBoolean(0))
  }

  test("UserAgentStage on a missing field tags _user_agent_failure") {
    val df = Seq(("c1", 0, "user", "x", "none", new java.sql.Timestamp(0L)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val out = Pipeline(df, Seq(UserAgentStage("ua_field_that_does_not_exist")))
    val r = out.select(array_join(col(Envelope.TagsCol), ","),
      element_at(col(Envelope.FieldsCol), "_user_agent_error")).collect()(0)
    assert(r.getString(0) == "_user_agent_failure")
    assert(r.getString(1) != null)
  }
}
