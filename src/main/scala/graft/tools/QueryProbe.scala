package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: per-query wall time at local[32] for a named subset of
  * SparkEntry.queries on a given SF dir (args: sfDir query...), warm JVM,
  * min of 3 — for comparing an operator restructure against the prior
  * round's BENCH numbers without paying for the full bench.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q_dedup_pairs", "q_embed_neardup", "q_dedup_clusters", "q_facts")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      // consume via toRdd: a bare count() lets Catalyst prune pure
      // projections (scoring lattices) down to a row count — toRdd
      // materializes every output column of the plan as written
      def run(): Long = fn(s, sfDir).queryExecution.toRdd.count()
      run() // warm
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        run()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"QUERY $n%-20s best=$best%.3f s")
    }
    s.stop()
  }
}
