package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: where q_nano_ts's time goes — the multi-attempt
  * `try_to_timestamp` coalesce pays THREE failed format attempts per
  * row before the 9-digit RFC3339Nano pattern succeeds. Compares the
  * shipped normalizeTimestamp against a single-pattern parse and a
  * fraction-length dispatch (one cheap regex + exactly one parse
  * attempt per row). Args: [sfDir]
  */
object NanoProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val ev = s.read.parquet(s"$sfDir/events.parquet")
    println(s"NANO rows=${ev.count()}")
    val raw = concat(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"),
      lit(".123456789Z"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(body: => Unit): Unit = {
      body // warm
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"NANO $label%-12s $best%.3f s")
    }
    timed("raw") { noop(ev.select(col("event_id"), raw.as("raw"))) }
    timed("single") {
      noop(ev.select(col("event_id"),
        try_to_timestamp(raw, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSSXXX")).as("t")))
    }
    timed("shipped") {
      val (t, f) = graft.functions.EventFns.normalizeTimestamp(raw, lit(null).cast("timestamp"))
      noop(ev.select(col("event_id"), t.as("t"), f.as("f")))
    }
    val d = length(regexp_extract(raw, "\\.(\\d+)", 1))
    timed("dispatch") {
      val parsed =
        when(d === 0, try_to_timestamp(raw, lit("yyyy-MM-dd'T'HH:mm:ssXXX")))
          .when(d === 6, try_to_timestamp(raw, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")))
          .when(d === 3, try_to_timestamp(raw, lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")))
          .when(d === 9, try_to_timestamp(raw, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSSXXX")))
      noop(ev.select(col("event_id"), parsed.as("t")))
    }
    s.stop()
  }
}
