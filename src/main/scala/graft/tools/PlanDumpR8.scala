package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-8 plan evidence: `explain("formatted")` of the queries this
  * optimization round touched, written to plans/r08/<query>_<tag>.txt.
  * Run with tag `after` on the optimized tree (and `before` on the
  * pre-round tree via stash) so the committed pair backs the plan-diff
  * claims in OPTIMIZATION_r08.md. Args: [tag] [outDir] [sfDir]
  *
  * q_pagerank's builder runs eagerly (persist + per-round
  * localCheckpoint), so its "plan" here is the final consume plan over
  * the checkpointed ranks — exactly the point of the change: the K
  * unrolled rounds are gone from the plan.
  */
object PlanDumpR8 {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "after"
    val outDir = if (args.length > 1) args(1) else "plans/r08"
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "false") // show static codegen stages
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    def dump(name: String): Unit = {
      val df = graft.SparkEntry.queries(name)(s, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), txt)
      println(s"PLAN $name -> $outDir/${name}_$tag.txt (${txt.linesIterator.size} lines)")
    }
    Seq("q_pagerank", "q_bpe_encode", "q_bpe_merges", "q_nano_ts").foreach(dump)
    s.stop()
  }
}
