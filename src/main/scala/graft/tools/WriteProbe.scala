package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: A/B the flagship sink write's dynamic-partition
  * strategy in ONE warm session (paired samples — this VM's noise
  * swamps cross-JVM comparison). Variant `sorted` is the default
  * planned write (local sort by `_sink` per task, then one open writer
  * at a time); variant `concurrent` disables the planned-write sort and
  * allows one open writer per sink (the sink set is routing-config-
  * bounded — 3 here — so concurrent writers cost O(sinks) memory per
  * task at ANY scale, while the sort costs O(rows) per task always).
  * Args: [cores] [pairs] [inputDir]
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 8
    val pairs = if (args.length > 1) args(1).toInt else 3
    val input = if (args.length > 2) args(2) else "/tmp/graft_bench_input_v3_600000"
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
    def assigned() = {
      val p = graft.pipeline.Pipeline(s.read.parquet(input), graft.TranscriptPipeline.stages)
      graft.route.Router.assign(
        graft.enrich.Enrich.withLookup(
          graft.enrich.Enrich.withLookup(p, graft.enrich.Enrich.roleLookup(s), Seq("role")),
          graft.enrich.Enrich.toolLookup(s), Seq("tool")),
        graft.TranscriptPipeline.sinks, graft.TranscriptPipeline.DefaultSink)
    }
    def write(sorted: Boolean): Double = {
      if (sorted) {
        s.conf.set("spark.sql.optimizer.plannedWrite.enabled", "true")
        s.conf.set("spark.sql.maxConcurrentOutputFileWriters", "0")
      } else {
        s.conf.set("spark.sql.optimizer.plannedWrite.enabled", "false")
        s.conf.set("spark.sql.maxConcurrentOutputFileWriters", "8")
      }
      val t0 = System.nanoTime()
      graft.route.Router.write(assigned(), "/tmp/graft_writeprobe_out")
      (System.nanoTime() - t0) / 1e9
    }
    write(sorted = true) // warm
    for (i <- 1 to pairs) {
      val a = write(sorted = true)
      val b = write(sorted = false)
      println(f"WRITEPAIR $i%d cores=$cores sorted=$a%.3f s concurrent=$b%.3f s delta=${a - b}%+.3f")
    }
    s.stop()
  }
}
