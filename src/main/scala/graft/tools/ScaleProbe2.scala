package graft.tools
import org.apache.spark.sql.SparkSession
import graft.route.Router
import graft.TranscriptPipeline
object ScaleProbe2 {
  def main(args: Array[String]): Unit = {
    val s = ScaleProbe.session(32)
    val in = "/tmp/graft_bench_input_300000"
    val df = () => TranscriptPipeline.run(s, s.read.parquet(in))
    Router.sinkCounts(df()).collect() // warm
    println("MARK warmed")
    for (i <- 1 to 6) {
      val t = ScaleProbe.t { Router.sinkCounts(df()).collect() }
      println(f"MARK agg$i=$t%.2f")
    }
    s.stop()
  }
}
