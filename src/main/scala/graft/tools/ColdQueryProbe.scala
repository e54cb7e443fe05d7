package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: COLD per-query cost — a fresh session per sample
  * (stop + clear between runs), first execution timed, interleaved with
  * a control query so a steal window shows up in both series. The
  * bench's query loop is cold-per-query in one session; this isolates
  * the plan+codegen+first-run cost a warm min-of-3 probe hides.
  * Args: sfDir control target [reps]
  */
object ColdQueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val control = if (args.length > 1) args(1) else "q_agg_counts"
    val target = if (args.length > 2) args(2) else "q_bpe_encode"
    val reps = if (args.length > 3) args(3).toInt else 3
    def freshSession(): SparkSession = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }
    def coldRun(name: String): Double = {
      val s = freshSession()
      try {
        // absorb session-global first-job costs on a trivial job so the
        // measured number is the QUERY's cold cost, not the session's
        s.range(1000).selectExpr("sum(id)").collect()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(s, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      } finally s.stop()
    }
    for (i <- 1 to reps) {
      val c = coldRun(control)
      val t = coldRun(target)
      println(f"COLD $i%d $control=$c%.3f s $target=$t%.3f s")
    }
  }
}
