package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: flagship pipeline wall time at local[8] under different
  * parquet output codecs (the sink write is the one unavoidable I/O pass,
  * so codec choice is a real lever). Backs the BENCH.md codec note with a
  * measurement instead of a guess.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val input = "/tmp/graft_bench_input_v3_600000"
    for (codec <- Seq("snappy", "lz4", "zstd", "snappy")) { // snappy twice: warm + tail
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s = SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", 8)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", codec)
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      // warm the session on a small slice
      graft.route.Router.write(
        graft.TranscriptPipeline.run(s, s.read.parquet("/tmp/graft_bench_warm")),
        "/tmp/perfprobe_out")
      var best = Double.MaxValue
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        graft.route.Router.write(
          graft.TranscriptPipeline.run(s, s.read.parquet(input)),
          "/tmp/perfprobe_out")
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"CODEC $codec%-8s best=$best%.2f s")
      s.stop()
    }
  }
}
