package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch probe: flagship-pipeline cost breakdown at a given core count
  * (guide §1.4: noop-sink isolation per stage prefix, so the sink write
  * and each transform band are separately attributable). Stages:
  *
  *   scan      — read the bench input, noop
  *   parse     — + conditional grok/kv/json pipeline, noop
  *   enrich    — + two broadcast lookups, noop
  *   assign    — + sink routing column, noop
  *   write     — full Router.write (the timed bench job)
  *
  * Each timed twice (min), warm session. Args: [cores] [inputDir]
  */
object PipelineBreakdown {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 8
    val input = if (args.length > 1) args(1) else "/tmp/graft_bench_input_v3_600000"
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.sql.parquet.compression.codec", "lz4")
      .config("spark.sql.files.maxPartitionBytes", 16L * 1024 * 1024)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def scan() = s.read.parquet(input)
    def parsed() = graft.pipeline.Pipeline(scan(), graft.TranscriptPipeline.stages)
    def enriched() = {
      val p = parsed()
      graft.enrich.Enrich.withLookup(
        graft.enrich.Enrich.withLookup(p, graft.enrich.Enrich.roleLookup(s), Seq("role")),
        graft.enrich.Enrich.toolLookup(s), Seq("tool"))
    }
    def assigned() = graft.route.Router.assign(enriched(),
      graft.TranscriptPipeline.sinks, graft.TranscriptPipeline.DefaultSink)
    def timed(label: String)(body: => Unit): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"BREAKDOWN cores=$cores $label%-8s $best%.3f s")
    }
    // warm: full path once
    graft.route.Router.write(assigned(), "/tmp/graft_breakdown_out")
    timed("plan") { assigned().queryExecution.executedPlan }
    timed("scan") { noop(scan()) }
    timed("parse") { noop(parsed()) }
    timed("enrich") { noop(enriched()) }
    timed("assign") { noop(assigned()) }
    timed("write") {
      graft.route.Router.write(assigned(), "/tmp/graft_breakdown_out")
    }
    s.stop()
  }
}
