package graft.route

import graft.SparkTestBase
import graft.enrich.Enrich
import org.apache.spark.sql.functions._

class RouterSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    ("c1", 0, "user", "hello", "none", new java.sql.Timestamp(1767225600000L)),
    ("c1", 1, "tool", "result", "search", new java.sql.Timestamp(1767225601000L)),
    ("c2", 0, "system", "boot", "none", new java.sql.Timestamp(1767225602000L))
  ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("first-match assignment with residual default") {
    val assigned = Router.assign(df, Seq(
      Sink("tools", col("tool") =!= "none"),
      Sink("sys", col("role") === "system")
    ), "main")
    val got = assigned.select("conv_id", "turn_idx", Router.SinkCol)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(got == Map(("c1", 0) -> "main", ("c1", 1) -> "tools", ("c2", 0) -> "sys"))
  }

  test("null predicate treated as no-match") {
    val assigned = Router.assign(df,
      Seq(Sink("x", lit(null).cast("boolean"))), "main")
    assert(assigned.select(Router.SinkCol).as[String].collect().forall(_ == "main"))
  }

  test("index-template install analog: schema manifest written with the sink data (transportes.go:186-252)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-router").toString
    val assigned = Router.assign(df, Seq(Sink("tools", col("tool") =!= "none")), "main")
    Router.write(assigned, tmp)
    val manifest = java.nio.file.Files.readString(java.nio.file.Paths.get(tmp, "_template.json"))
    val node = graft.functions.JsonFlatten.mapper.readTree(manifest)
    assert(node.get("index_patterns").get(0).asText() == "_sink=*")
    val props = node.get("mappings").get("properties")
    assert(props.get("conv_id").get("type").asText() == "string")
    assert(props.get("turn_idx").get("type").asText() == "int")
    assert(props.get("ts").get("type").asText() == "timestamp")
    assert(!props.has(Router.SinkCol)) // partition column, not a mapped field
    // data itself still written partitioned
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(tmp, "_sink=tools")))
  }

  test("doris tableManager analog: per-table day-partitioned write with retention (tablemanager.go:131-275)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-doris").toString
    val rows = Seq(
      ("c1", 0, "user", "a", "none", java.sql.Timestamp.valueOf("2026-01-10 00:00:00")),
      ("c1", 1, "user", "b", "search", java.sql.Timestamp.valueOf("2026-01-09 00:00:00")),
      ("c2", 0, "user", "c", "none", java.sql.Timestamp.valueOf("2025-12-01 00:00:00")) // stale
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .withColumn("event_ts", col("ts"))
    Router.writeDorisTables(rows, "logs_%{tool}", col("ts"),
      retentionDays = 14, now = lit(java.sql.Timestamp.valueOf("2026-01-10 00:00:00")), tmp)
    def exists(p: String) = java.nio.file.Files.exists(java.nio.file.Paths.get(tmp, p))
    assert(exists("_table=logs_none/_day=2026-01-10"))
    assert(exists("_table=logs_search/_day=2026-01-09"))
    assert(!exists("_table=logs_none/_day=2025-12-01")) // beyond retention
    assert(spark.read.parquet(tmp).count() == 2)
  }

  test("stripMeta drops @metadata-style columns before write (event.go:346-354)") {
    val withMeta = df.withColumn("_meta_receiver", lit("tcp"))
      .withColumn("_meta", lit("x"))
    val out = Router.stripMeta(withMeta)
    assert(!out.columns.exists(_.startsWith("_meta")))
    assert(out.columns.contains("text"))
  }

  test("doris-shaped projection: mapped fields + rest json (streamloadrequest.go:66-112)") {
    val withFields = df.withColumn("fields",
      map(lit("a"), lit("1"), lit("b"), lit("2"), lit("c"), lit("3")))
    val out = Router.dorisProjection(withFields, Seq("a", "c"))
    val row = out.filter(col("turn_idx") === 0 && col("conv_id") === "c1")
      .select("a", "c", "rest").collect()(0)
    assert(row.getString(0) == "1" && row.getString(1) == "3")
    assert(row.getString(2) == """{"b":"2"}""")
  }

  test("ES index pattern column (transportesfactory.go:37)") {
    val env = graft.pipeline.Pipeline.withEnvelope(df)
    val idx = Router.indexColumn(env, "logstash-%{+2006-01-02}")
    val got = env.select(idx).as[String].collect().toSet
    assert(got == Set("logstash-2026-01-01"))
  }

  test("geoip-shaped struct-target enrich (actiongeoip.go:139-167)") {
    val enriched = Enrich.withLookupStruct(df, Enrich.toolLookup(spark), Seq("tool"), "tool_info")
    val r = enriched.filter(col("tool") === "search")
      .select(col("tool_info.sink_hint"), col("tool_info.cost_class")).collect()(0)
    assert(r.getString(0) == "sink_tools" && r.getString(1) == "cheap")
    // static decoration fields
    val dec = Enrich.withStaticFields(df, Map("dc" -> "eu-1", "env" -> "prod"))
    assert(dec.select("dc", "env").distinct().collect()(0).toSeq == Seq("eu-1", "prod"))
  }

  test("retention keeps the day EXACTLY retentionDays old (Doris start=-N semantics)") {
    import spark.implicits._
    val now = java.sql.Timestamp.valueOf("2026-01-15 12:00:00")
    val df = Seq(
      ("keep_edge", java.sql.Timestamp.valueOf("2026-01-01 23:59:59")), // exactly 14 days
      ("keep_new",  java.sql.Timestamp.valueOf("2026-01-15 00:00:01")),
      ("drop_old",  java.sql.Timestamp.valueOf("2025-12-31 23:59:59"))  // 15 days
    ).toDF("k", "ts")
    val kept = df.filter(Router.retentionFilter(col("ts"), 14, lit(now)))
      .select("k").as[String].collect().toSet
    assert(kept == Set("keep_edge", "keep_new"),
      s"dynamic_partition.start=-14 retains the day 14 old; got $kept")
  }

  test("dorisProjection normalizes bracket-syntax mapped fields like every other path consumer") {
    import spark.implicits._
    val df = Seq(("r1", Map("user_agent.name" -> "Firefox", "other" -> "x")))
      .toDF("id", graft.model.Envelope.FieldsCol)
    val out = Router.dorisProjection(df, Seq("user_agent[name]"))
    val r = out.collect()(0)
    assert(r.getAs[String]("user_agent[name]") == "Firefox",
      "bracket path must hit the normalized key")
    assert(!r.getAs[String]("rest").contains("Firefox"),
      "a mapped field must not also ride in the rest JSON")
    assert(r.getAs[String]("rest").contains("other"))
  }
}
