package graft.metrics

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-partition throughput/lag — the north rule's admin-API analog at
  * partition granularity (the reference reports per-harvester
  * `speed_lps`/`speed_bps`/`processed_lines`/`completion`,
  * `lc-lib/harvester/harvester.go:540-568`; our "harvester" is a task
  * over one input partition).
  */
object PartitionMetrics {

  final case class PartitionStat(
      stageId: Int, partitionId: Int,
      records: Long, bytes: Long, wallSec: Double) {
    def recordsPerSec: Double = if (wallSec > 0) records / wallSec else 0.0
  }

  /** Listener accumulating read-side task metrics per partition. */
  final class Listener extends SparkListener {
    val stats = new ConcurrentHashMap[(Int, Int), PartitionStat]()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      if (te.taskMetrics != null && te.taskInfo != null) {
        val in = te.taskMetrics.inputMetrics
        if (in.recordsRead > 0) {
          val key = (te.stageId, te.taskInfo.index)
          stats.put(key, PartitionStat(te.stageId, te.taskInfo.index,
            in.recordsRead, in.bytesRead,
            (te.taskInfo.finishTime - te.taskInfo.launchTime) / 1e3))
        }
      }
    }
    def snapshot: Seq[PartitionStat] = {
      import scala.jdk.CollectionConverters._
      stats.values.asScala.toSeq.sortBy(s => (s.stageId, s.partitionId))
    }
  }

  def attach(spark: SparkSession): Listener = {
    val l = new Listener
    spark.sparkContext.addSparkListener(l)
    l
  }

  /** Event-time lag per sink: seconds between the batch reference time
    * (newest event in the batch) and each sink's newest routed event —
    * the batch analog of consumer lag.
    */
  def sinkLag(assigned: DataFrame): DataFrame = {
    assigned
      .groupBy(col(graft.route.Router.SinkCol).as("sink"))
      .agg(max(col("event_ts")).as("newest"))
      .withColumn("_ref", max(col("newest")).over())
      .select(col("sink"),
        (unix_timestamp(col("_ref")) - unix_timestamp(col("newest"))).as("lag_sec"))
  }

  def toJson(parts: Seq[PartitionStat]): String =
    parts.map(p =>
      f"""{"stage":${p.stageId},"partition":${p.partitionId},"records":${p.records},""" +
      f""""bytes":${p.bytes},"wall_sec":${p.wallSec}%.3f,"records_per_sec":${p.recordsPerSec}%.1f}""")
      .mkString("[", ",", "]")
}
