package graft

import org.apache.spark.sql.functions._

import graft.model.TranscriptGen
import graft.route.Router

/** The north-rule correctness gate (BASELINE.md): per-sink aggregate
  * counts, routed-row equality, and per-turn `text` equality under stable
  * `(conv_id, turn_idx)` ordering, engine vs the row-at-a-time oracle —
  * mirroring the reference's rspec end-to-end content+order checks
  * (`ruby/log-courier/spec/gem_spec.rb:22-48`).
  */
class EndToEndSpec extends SparkTestBase {

  private val seed = 42L
  private val nConvs = 60L

  private lazy val oracle =
    TranscriptGen.generateLocal(seed, nConvs).map(PipelineOracle.process)

  private lazy val engineRows = {
    val turns = TranscriptGen.generate(spark, seed, nConvs, parallelism = 4).toDF()
    TranscriptPipeline.run(spark, turns)
      .select("conv_id", "turn_idx", "text", "tags", "fields", "event_ts", Router.SinkCol)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r).toMap
  }

  test("flagship plan regression guard: shuffle-free parse→enrich→route, broadcast-only joins") {
    // the scale argument (BENCH.md): the assigned frame must stay ONE
    // narrow pipeline — a shuffle exchange introduced here would turn a
    // split-parallel 100 TB job into a cluster-wide repartition
    val turns = TranscriptGen.generate(spark, 3L, 10L, parallelism = 2).toDF()
    val assigned = TranscriptPipeline.run(spark, turns)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"flagship plan grew a shuffle exchange:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "enrich joins must be broadcast")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"))
  }

  test("no rows lost or duplicated") {
    assert(engineRows.size == oracle.size)
  }

  test("per-turn text equality under stable (conv_id, turn_idx) order") {
    val sortedOracle = oracle.sortBy(o => (o.turn.conv_id, o.turn.turn_idx))
    for (o <- sortedOracle) {
      val r = engineRows((o.turn.conv_id, o.turn.turn_idx))
      assert(r.getString(2) == o.turn.text,
        s"text mismatch at ${o.turn.conv_id}/${o.turn.turn_idx}")
    }
  }

  test("per-turn sink assignment (routed-row equality)") {
    for (o <- oracle) {
      val r = engineRows((o.turn.conv_id, o.turn.turn_idx))
      assert(r.getString(6) == o.sink,
        s"sink mismatch at ${o.turn.conv_id}/${o.turn.turn_idx}: " +
          s"engine=${r.getString(6)} oracle=${o.sink} text='${o.turn.text.take(60)}'")
    }
  }

  test("per-turn tags equality (sorted-set invariants)") {
    for (o <- oracle) {
      val r = engineRows((o.turn.conv_id, o.turn.turn_idx))
      val got = r.getSeq[String](3).toList
      assert(got == o.tags,
        s"tags mismatch at ${o.turn.conv_id}/${o.turn.turn_idx}: " +
          s"engine=$got oracle=${o.tags} text='${o.turn.text.take(60)}'")
    }
  }

  test("per-turn extracted fields equality") {
    for (o <- oracle) {
      val r = engineRows((o.turn.conv_id, o.turn.turn_idx))
      val got = r.getMap[String, String](4).toMap
      assert(got == o.fields,
        s"fields mismatch at ${o.turn.conv_id}/${o.turn.turn_idx}: " +
          s"engine=$got oracle=${o.fields} text='${o.turn.text.take(80)}'")
    }
  }

  test("per-turn event_ts equality (date action)") {
    for (o <- oracle) {
      val r = engineRows((o.turn.conv_id, o.turn.turn_idx))
      assert(r.getTimestamp(5) == o.eventTs,
        s"event_ts mismatch at ${o.turn.conv_id}/${o.turn.turn_idx}: " +
          s"engine=${r.getTimestamp(5)} oracle=${o.eventTs} text='${o.turn.text.take(60)}'")
    }
  }

  test("per-sink aggregate counts and byte totals") {
    val turns = TranscriptGen.generate(spark, seed, nConvs, parallelism = 4).toDF()
    val agg = Router.sinkCounts(TranscriptPipeline.run(spark, turns))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = oracle.groupBy(_.sink).view.mapValues { os =>
      (os.size.toLong, os.map(_.turn.text.getBytes("UTF-8").length.toLong).sum)
    }.toMap
    assert(agg == want)
  }

  test("sinks partition the batch exactly") {
    val total = oracle.size
    val bySink = oracle.groupBy(_.sink).view.mapValues(_.size).toMap
    assert(bySink.values.sum == total)
    assert(bySink.keySet == Set("sink_tools", "sink_errors", "sink_main"))
  }

  test("per-(sink, role, tool) aggregates match oracle") {
    val turns = TranscriptGen.generate(spark, seed, nConvs, parallelism = 4).toDF()
    val agg = TranscriptPipeline.aggregates(spark, turns)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    val want = oracle.groupBy(o => (o.sink, o.turn.role, o.turn.tool))
      .view.mapValues(_.size.toLong).toMap
    assert(agg == want)
  }
}
