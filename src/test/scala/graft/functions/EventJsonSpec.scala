package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class EventJsonSpec extends SparkTestBase {
  import spark.implicits._

  test("wire JSON: top-level field merge, _meta strip, FloatValue rule") {
    val df = Seq((
      "hello", 87.0, 3L,
      Map("extracted" -> "v1", "k2" -> "v2"),
      Seq("a", "b"),
      "secret"
    )).toDF("message", "score", "offset", "fields", "tags", "_meta_receiver")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))

    val json = df.select(EventJsonEncode.forFrame(df).as("j")).as[String].collect()(0)
    val node = JsonFlatten.mapper.readTree(json)
    assert(node.get("message").asText() == "hello")
    // FloatValue64 rule: whole floats keep a decimal point
    assert(json.contains("\"score\":87.0"))
    assert(node.get("offset").asLong() == 3L)
    // dynamic fields merged at TOP level (event.go data map shape)
    assert(node.get("extracted").asText() == "v1" && node.get("k2").asText() == "v2")
    assert(!node.has("fields"))
    // @metadata never serialised
    assert(!json.contains("_meta") && !json.contains("secret"))
    assert(node.get("tags").get(0).asText() == "a")
    assert(node.get("ts").asText() == "2026-01-01T00:00:00Z")
  }

  test("FloatType renders 32-bit shortest digits (FloatValue32, strconv.FormatFloat(...,32))") {
    import EventJsonEncode.goFloat32String
    // widening 0.1f to double renders "0.10000000149011612"; the 32-bit
    // path must give Go's float32 shortest form
    assert(goFloat32String(0.1f) == "0.1")
    assert(goFloat32String(1.5f) == "1.5")
    assert(goFloat32String(87f) == "87.0")
    assert(goFloat32String(0.0f) == "0.0")
    assert(goFloat32String(-0.0f) == "-0.0")
    assert(goFloat32String(1.0e10f) == "10000000000.0")
    val df = Seq((0.1f, Seq(0.3f, 2.5f))).toDF("f", "fs")
    val json = df.select(EventJsonEncode(struct(col("f"), col("fs"))).as("j"))
      .as[String].collect()(0)
    assert(json == """{"f":0.1,"fs":[0.3,2.5]}""")
  }

  test("RFC3339Nano (9-digit fraction) timestamps parse without a failure tag (timestamp.go:34-46)") {
    val df = Seq(
      "2026-01-01T00:00:00.123456789Z", // nano — the reference accepts this
      "2026-01-01T00:00:00.123456Z",
      "2026-01-01T00:00:00Z",
      "not a timestamp").toDF("raw")
    val (ts, failed) = EventFns.normalizeTimestamp(col("raw"), lit(null).cast("timestamp"))
    val rows = df.select(ts.as("ts"), failed.as("failed")).collect()
    assert(!rows(0).getBoolean(1), "nano-fraction timestamp must parse")
    // truncated to Spark's microsecond precision
    assert(rows(0).getTimestamp(0).toInstant.toString == "2026-01-01T00:00:00.123456Z")
    assert(!rows(1).getBoolean(1) && !rows(2).getBoolean(1))
    assert(rows(3).getBoolean(1), "garbage still tags _timestamp_parse_failure")
  }

  test("Go FormatFloat('f',-1) plain notation — never scientific (pattern of Event.Bytes)") {
    import EventJsonEncode.goFloatString
    assert(goFloatString(1.0e10) == "10000000000.0")
    assert(goFloatString(1.0e-4) == "0.0001")
    assert(goFloatString(87.0) == "87.0")
    assert(goFloatString(0.5) == "0.5")
    assert(goFloatString(-2.5e7) == "-25000000.0")
    assert(goFloatString(0.0) == "0.0")
    assert(goFloatString(-0.0) == "-0.0")
    assert(goFloatString(1234.5678) == "1234.5678")
    // rendered through the encoder, not just the helper
    val df = Seq((1.0e10, 1.5e-3)).toDF("big", "small")
    val json = df.select(EventJsonEncode.forFrame(df).as("j")).as[String].collect()(0)
    assert(json.contains("\"big\":10000000000.0") && json.contains("\"small\":0.0015"))
  }

  test("RFC3339Nano timestamps: fraction trimmed, no 3/6/9 padding (timestamp.go:34-46)") {
    import EventJsonEncode.rfc3339Nano
    val base = java.time.Instant.parse("2026-01-01T00:00:00Z").toEpochMilli * 1000L
    assert(rfc3339Nano(base) == "2026-01-01T00:00:00Z")
    assert(rfc3339Nano(base + 500000L) == "2026-01-01T00:00:00.5Z")
    assert(rfc3339Nano(base + 123000L) == "2026-01-01T00:00:00.123Z")
    assert(rfc3339Nano(base + 120000L) == "2026-01-01T00:00:00.12Z")   // not .120
    assert(rfc3339Nano(base + 1L) == "2026-01-01T00:00:00.000001Z")
  }

  test("map columns with null values render JSON null instead of NPE") {
    val df = Seq((Map("a" -> Some("1"), "b" -> Option.empty[String]), "x"))
      .toDF("fields", "message")
    val json = df.select(EventJsonEncode.forFrame(df).as("j")).as[String].collect()(0)
    assert(json.contains("\"b\":null") && json.contains("\"a\":\"1\""))
  }

  test("ECS-nested envelopes wire-encode recursively (docs/Events.md:31-45 shape)") {
    val base = Seq(("m1", "c1")).toDF("message", "conv_id")
    val ecs = graft.enrich.Ecs.decorate(base,
      graft.enrich.EcsConfig(addHostField = true, addTimezoneField = true, enableEcs = true),
      host = lit("node1"), timezone = lit("+0000 UTC"), timezoneName = lit("UTC"),
      path = lit("/t/c1.log"), offset = lit(7L))
    val json = ecs.select(EventJsonEncode.forFrame(ecs).as("j")).as[String].collect()(0)
    val node = JsonFlatten.mapper.readTree(json)
    assert(node.get("host").get("name").asText() == "node1")
    assert(node.get("host").get("hostname").asText() == "node1")
    assert(node.get("event").get("timezone").asText() == "+0000 UTC")
    assert(node.get("log").get("file").get("path").asText() == "/t/c1.log")
    assert(node.get("log").get("offset").asLong() == 7L)
    // double arrays (geo location) render via the FloatValue rule
    val geo = Seq((Seq(-0.0931, 51.5142), "x")).toDF("location", "m")
    val gj = geo.select(EventJsonEncode.forFrame(geo).as("j")).as[String].collect()(0)
    assert(gj.contains("\"location\":[-0.0931,51.5142]"))
  }

  test("pattern strings JSON-encode non-string fields (pattern.go:86-97)") {
    import org.apache.spark.sql.types.DataType
    val df = Seq((87.0, Seq("a", "b"), 42L, "raw"))
      .toDF("score", "tags", "n", "message")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
    val typeOf: String => Option[DataType] =
      n => df.schema.fields.find(_.name == n).map(_.dataType)
    val out = df.select(EventFns.patternFormat(
      "s=%{score} t=%{tags} n=%{n} m=%{message} miss=%{absent}",
      n => if (df.columns.contains(n)) df(n) else lit(null).cast("string"),
      col("ts"), typeOf).as("p")).as[String].collect()(0)
    // float: FloatValue decimal-point JSON; array: JSON; string: raw;
    // missing: empty string
    assert(out == """s=87.0 t=["a","b"] n=42 m=raw miss=""")
  }

  test("deterministic over the flagship pipeline output") {
    val turns = graft.model.TranscriptGen.generate(spark, 11L, 10L, 2).toDF()
    val assigned = graft.TranscriptPipeline.run(spark, turns)
    val j1 = assigned.select(EventJsonEncode.forFrame(assigned).as("j"))
      .orderBy("j").as[String].collect()
    val j2 = assigned.select(EventJsonEncode.forFrame(assigned).as("j"))
      .orderBy("j").as[String].collect()
    assert(j1.toSeq == j2.toSeq)
    assert(j1.forall(s => s.startsWith("{") && s.contains("\"conv_id\"")))
  }
}
