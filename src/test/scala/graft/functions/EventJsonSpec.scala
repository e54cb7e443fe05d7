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
