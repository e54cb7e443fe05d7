package graft.tools
import org.apache.spark.sql.SparkSession
import graft.route.Router
import graft.TranscriptPipeline
import graft.model.TranscriptGen
object EvalCount {
  def main(args: Array[String]): Unit = {
    val s = ScaleProbe.session(4)
    val turns = TranscriptGen.generate(s, 42L, 500L, 4).toDF()
    val n = turns.count()
    graft.grok.GrokCounters.evals.set(0)
    graft.functions.KvCounters.evals.set(0)
    Router.write(TranscriptPipeline.run(s, turns), "/tmp/ec_out")
    val nginxRows = turns.filter(org.apache.spark.sql.functions.col("text").rlike("^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3} ")).count()
    val kvRows = turns.filter(org.apache.spark.sql.functions.col("text").rlike("^[a-z]+=")).count()
    println(s"EVALCOUNT total=$n nginxRows=$nginxRows grokEvals=${graft.grok.GrokCounters.evals.get()} kvRows=$kvRows kvEvals=${graft.functions.KvCounters.evals.get()}")
    s.stop()
  }
}
