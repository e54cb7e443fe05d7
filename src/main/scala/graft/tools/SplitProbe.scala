package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: flagship pipeline wall time vs
  * `spark.sql.files.maxPartitionBytes` at local[8] and local[2]. The 8M-turn
  * bench input is 32 × 8 MB files; default packing (128 MB cap,
  * totalBytes/parallelism target, 4 MB open cost) gives ~8 uneven splits
  * on 8 cores (one wave, straggler-bound) and ~3 on 2 cores (terrible
  * balance), so the split size is a real lever on the measured legs.
  */
object SplitProbe {
  def main(args: Array[String]): Unit = {
    val input = "/tmp/graft_bench_input_v3_600000"
    for (cores <- Seq(8, 2); mpb <- Seq("default", "33554432", "16777216", "8388608")) {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val b = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "lz4")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.ui.enabled", "false")
      if (mpb != "default") b.config("spark.sql.files.maxPartitionBytes", mpb)
      val s = b.getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      val nparts = s.read.parquet(input).rdd.getNumPartitions
      graft.route.Router.write(
        graft.TranscriptPipeline.run(s, s.read.parquet("/tmp/graft_bench_warm")),
        "/tmp/splitprobe_out") // warm
      var best = Double.MaxValue
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        graft.route.Router.write(
          graft.TranscriptPipeline.run(s, s.read.parquet(input)),
          "/tmp/splitprobe_out")
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"SPLIT cores=$cores mpb=$mpb%-9s parts=$nparts best=$best%.2f s")
      s.stop()
    }
  }
}
