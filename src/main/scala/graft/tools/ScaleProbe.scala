package graft.tools
import org.apache.spark.sql.SparkSession
import graft.route.Router
import graft.TranscriptPipeline
object ScaleProbe {
  def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR"); s
  }
  def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
  def main(args: Array[String]): Unit = {
    val in = "/tmp/graft_bench_input_300000"
    for (cores <- Seq(32, 8)) {
      val s = session(cores)
      val df = () => TranscriptPipeline.run(s, s.read.parquet(in))
      // warmups
      Router.sinkCounts(df()).collect()
      Router.write(df(), "/tmp/sp_out")
      val agg0 = t { Router.sinkCounts(df()).collect() }
      val agg1 = t { Router.sinkCounts(df()).collect() }
      val agg2 = t { Router.sinkCounts(df()).collect() }
      val wr1 = t { Router.write(df(), "/tmp/sp_out") }
      val wr2 = t { Router.write(df(), "/tmp/sp_out") }
      val cnt = t { df().count() }
      println(f"PROBE cores=$cores agg=$agg1%.2f/$agg2%.2f write=$wr1%.2f/$wr2%.2f count=$cnt%.2f")
      s.stop()
    }
  }
}
