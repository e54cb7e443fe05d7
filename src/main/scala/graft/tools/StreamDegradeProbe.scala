package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: does repeated streaming-query execution DEGRADE a
  * shared session (the bench runs six streaming queries in one
  * session)? Interleaves a fixed batch control (q_agg_counts) with a
  * streaming query N times and prints both series plus heap — if the
  * control stays flat while the stream grows, the cost is accumulated
  * session/streaming state, not machine noise. Args: sfDir [reps] [query]
  */
object StreamDegradeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val qname = if (args.length > 2) args(2) else "q_stream_windows"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val stream = graft.SparkEntry.queries(qname)
    val control = graft.SparkEntry.queries("q_agg_counts")
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(s, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    time(control); time(stream) // warm
    for (i <- 1 to reps) {
      val c = time(control)
      val st = time(stream)
      val rt = Runtime.getRuntime
      val heapMb = (rt.totalMemory() - rt.freeMemory()) >> 20
      println(f"DEGRADE $i%d control=$c%.3f s stream=$st%.3f s heapMB=$heapMb")
    }
    s.stop()
  }
}
