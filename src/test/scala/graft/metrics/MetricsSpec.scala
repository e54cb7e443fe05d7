package graft.metrics

import graft.SparkTestBase
import graft.model.TranscriptGen
import graft.route.Router
import graft.TranscriptPipeline
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkTestBase {

  test("per-sink report sums to the input and renders JSON") {
    val turns = TranscriptGen.generate(spark, 5L, 20L, 4).toDF()
    val assigned = TranscriptPipeline.run(spark, turns)
    val report = Metrics.fromSinkCounts(Router.sinkCounts(assigned), 2.0)
    assert(report.inputTurns == turns.count())
    assert(report.turnsPerSec == report.inputTurns / 2.0)
    val json = Metrics.toJson(report)
    assert(json.contains("\"sinks\":[") && json.contains("sink_main"))
  }

  test("partition listener captures per-partition read throughput") {
    val listener = PartitionMetrics.attach(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft-metrics").toString
    TranscriptGen.generate(spark, 6L, 40L, 4).toDF()
      .write.mode("overwrite").parquet(s"$tmp/in")
    spark.read.parquet(s"$tmp/in").count()
    org.apache.spark.graftbridge.CoreBridge.waitListenerBusEmpty(spark.sparkContext)
    val parts = listener.snapshot
    assert(parts.nonEmpty)
    assert(parts.map(_.records).sum > 0)
    val json = PartitionMetrics.toJson(parts)
    assert(json.startsWith("[{\"stage\":"))
  }

  test("sink event-time lag is zero for the newest sink, non-negative otherwise") {
    val turns = TranscriptGen.generate(spark, 7L, 30L, 4).toDF()
    val assigned = TranscriptPipeline.run(spark, turns)
    val lags = PartitionMetrics.sinkLag(assigned)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lags.values.min == 0L)
    assert(lags.values.forall(_ >= 0L))
  }

  test("RunPipeline main end-to-end with lineage resume") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-runpipe").toString
    TranscriptGen.generate(spark, 8L, 25L, 4).toDF()
      .write.mode("overwrite").parquet(s"$tmp/in")
    // note: RunPipeline builds its own session config via getOrCreate —
    // reuses this suite's session in-process
    RunPipelineHarness.run(spark, s"$tmp/in", s"$tmp/out", "b1", 8)
    val n1 = graft.lineage.Lineage.readData(spark, s"$tmp/out").count()
    // second run is a no-op (all buckets sealed)
    val committed = graft.lineage.Lineage.run(
      TranscriptPipeline.run(spark, spark.read.parquet(s"$tmp/in")),
      s"$tmp/out", 8, "b2")
    assert(committed == 0)
    assert(graft.lineage.Lineage.readData(spark, s"$tmp/out").count() == n1)
    assert(n1 == spark.read.parquet(s"$tmp/in").count())
  }
}

/** In-process harness mirroring RunPipeline.main's body (main would spawn
  * session config conflicts inside the shared test JVM).
  */
object RunPipelineHarness {
  def run(spark: org.apache.spark.sql.SparkSession, in: String, out: String,
      batchId: String, buckets: Int): Unit = {
    val assigned = TranscriptPipeline.run(spark, spark.read.parquet(in))
    graft.lineage.Lineage.run(Router.stripMeta(assigned), out, buckets, batchId)
  }
}
