package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.enrich.Enrich
import graft.grok.Grok
import graft.model.Envelope
import graft.pipeline._
import graft.route.{Router, Sink}

/** The canonical end-to-end job: parse → enrich → route → aggregate over
  * the transcripts table — the Spark rebuild of the reference's carver
  * pipeline (`testing/log-carver.yaml`: conditional grok of nginx lines,
  * date normalisation, tagging, per-sink routing).
  *
  * Scale design: the whole job is one declarative plan — a scan, pure
  * column transforms (regex/FSM expressions inside codegen), two broadcast
  * joins (no fact shuffle), one `partitionBy(_sink)` write pass and one
  * hash aggregate with map-side partials. The only wide exchange at any
  * scale is the aggregate's (and the optional lineage bucketing), both
  * keyed well below cardinality of conv_id. Skewed conversations don't
  * matter here because nothing groups by conv_id; the multiline variant
  * (Multiline.sessionize) is where conv_id grouping appears, and its
  * window shuffle hash-partitions convs across executors (heavy convs are
  * bounded by conversation length, not table size).
  */
object TranscriptPipeline {

  /** Branch selection mirrors the nginx soak config's
    * `if has(event.type) && event.type == "nginx"` shape, keyed on line
    * shape since our corpus is self-describing.
    */
  def stages: Seq[Stage] = Seq(
    ConditionalStage(
      branches = Seq(
        ("""event.text.matches("^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3} ")""", Seq(
          GrokStage("text", Seq(Grok.NginxAccess)),
          DateStage("timestamp", Seq("02/Jan/2006:15:04:05 -0700")),
          AddTagStage("nginx"))),
        ("""event.text.matches("^[a-z]+=")""", Seq(
          KvStage("text"),
          AddTagStage("kv"))),
        ("""event.text.startsWith("{")""", Seq(
          JsonStage("text"),
          AddTagStage("json")))
      ),
      otherwiseStages = Seq(AddTagStage("plain"))
    )
  )

  /** Routing predicates (FIXTURES.md §4) — first match wins, residual to
    * `sink_main`; the three sinks partition the batch exactly.
    */
  def sinks: Seq[Sink] = Seq(
    Sink("sink_tools", col("tool") =!= "none"),
    Sink("sink_errors",
      array_contains(col(Envelope.TagsCol), "_grok_failure") || col("role") === "system")
  )
  val DefaultSink = "sink_main"

  /** Full pipeline: returns the parsed+enriched+sink-assigned frame. */
  def run(spark: SparkSession, turns: DataFrame): DataFrame =
    run(spark, turns, stages)

  /** Full pipeline with a caller-supplied parse stage list (the
    * config-driven production face — [[RunPipeline]] loads it from a
    * YAML/JSON file); enrich + route stay the engine's own.
    */
  def run(spark: SparkSession, turns: DataFrame,
      parseStages: Seq[Stage]): DataFrame = {
    val parsed = Pipeline(turns, parseStages)
    val enriched = Enrich.withLookup(
      Enrich.withLookup(parsed, Enrich.roleLookup(spark), Seq("role")),
      Enrich.toolLookup(spark), Seq("tool"))
    Router.assign(enriched, sinks, DefaultSink)
  }

  /** Aggregates-only entry (north rule verification surface). */
  def aggregates(spark: SparkSession, turns: DataFrame): DataFrame =
    Router.aggregates(run(spark, turns))
}
