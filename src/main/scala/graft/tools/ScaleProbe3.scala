package graft.tools
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import graft.route.Router
import graft.TranscriptPipeline
import java.nio.file.{Files, Paths}
object ScaleProbe3 {
  def deleteRec(p: java.nio.file.Path): Unit =
    graft.util.Fs.deleteRecursively(p)
  def main(args: Array[String]): Unit = {
    val in = "/tmp/graft_bench_input_150000"
    for (cores <- Seq(8, 2, 8, 2)) {
      val s = ScaleProbe.session(cores)
      if (!Files.exists(Paths.get(in + "/_SUCCESS")))
        graft.model.TranscriptGen.generate(s, 42L, 150000L, 128).write.mode("overwrite").parquet(in)
      @volatile var jobStart = 0L; @volatile var jobEnd = 0L; @volatile var taskSec = 0.0
      @volatile var gcSec = 0.0; @volatile var cpuSec = 0.0
      s.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit = if (jobStart == 0) jobStart = j.time
        override def onJobEnd(j: SparkListenerJobEnd): Unit = jobEnd = j.time
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null) {
            taskSec += (t.taskInfo.finishTime - t.taskInfo.launchTime)/1e3
            if (t.taskMetrics != null) {
              gcSec += t.taskMetrics.jvmGCTime/1e3
              cpuSec += t.taskMetrics.executorCpuTime/1e9
            }
          }
      })
      // warm
      Router.write(TranscriptPipeline.run(s, s.read.parquet(in)), "/tmp/sp3_out")
      for (i <- 1 to 2) {
        deleteRec(Paths.get("/tmp/sp3_out"))
        jobStart = 0; jobEnd = 0; taskSec = 0; gcSec = 0; cpuSec = 0
        val t0 = System.nanoTime()
        Router.write(TranscriptPipeline.run(s, s.read.parquet(in)), "/tmp/sp3_out")
        val total = (System.nanoTime()-t0)/1e9
        org.apache.spark.graftbridge.CoreBridge.waitListenerBusEmpty(s.sparkContext)
        val jobDur = (jobEnd - jobStart)/1e3
        println(f"PROBE3 cores=$cores run$i total=$total%.2f job=$jobDur%.2f taskWallSum=$taskSec%.1f taskCpuSum=$cpuSec%.1f gcSum=$gcSec%.1f")
      }
      s.stop()
    }
  }
}
