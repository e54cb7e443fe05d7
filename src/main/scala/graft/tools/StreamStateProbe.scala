package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: A/B the streaming queries' state-partition count
  * inside ONE warm session (machine noise on this VM swamps any
  * cross-JVM comparison — identical runs vary up to ±40%). Alternates
  * `spark.graft.stream.statePartitions` between the session's batch
  * width (32 — the pre-r8 behaviour) and the reduced value, several
  * pairs, printing every sample: the paired deltas are the signal.
  * Args: sfDir query [pairs].
  */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "q_stream_dedup"
    val pairs = if (args.length > 2) args(2).toInt else 3
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    def run(parts: Int): Double = {
      s.conf.set("spark.graft.stream.statePartitions", parts)
      val t0 = System.nanoTime()
      fn(s, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    run(32) // warm
    for (i <- 1 to pairs) {
      val a = run(32)
      val b = run(8)
      println(f"PAIR $i%d $name state32=$a%.3f s state8=$b%.3f s delta=${a - b}%+.3f")
    }
    s.stop()
  }
}
