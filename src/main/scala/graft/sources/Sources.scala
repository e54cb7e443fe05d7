package graft.sources

import java.io.InputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The two line-shaped sources the round-1 survey scoped out as socket
  * machinery, re-expressed with their actual semantics:
  *
  *  - S5 stdin (`lc-lib/stdinharvester/stdinharvester.go:20-44`): a
  *    harvester over `os.Stdin` — one event per line, byte offsets, the
  *    conventional `-` path. Stdin is inherently a single-process feed,
  *    so the driver reads it and parallelises afterwards; everything
  *    downstream (codecs, actions, routing) is the normal distributed
  *    pipeline.
  *  - S7 stream receiver (`lc-lib/transports/tcp/stream/protocol.go:58-77`):
  *    raw newline-delimited text over TCP, one event per line, NO acks
  *    (`NilNonce`) — which is exactly Structured Streaming's `socket`
  *    source contract (at-most-once, no offset tracking).
  */
object Sources {

  /** One event per stdin line with the harvester's running byte offset
    * (offset = end of line in the stream, like the registrar records).
    */
  def stdin(spark: SparkSession, in: InputStream = System.in,
      parallelism: Int = 8): DataFrame = {
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    val withOffsets = lines.scanLeft(("", 0L)) { case ((_, off), line) =>
      (line, off + line.getBytes("UTF-8").length + 1) // +1 = the newline
    }.drop(1)
    import spark.implicits._
    withOffsets.toDF("text", "offset")
      .withColumn("path", lit("-"))
      .repartition(parallelism)
  }

  /** Newline-delimited TCP text as an unacked event stream — column names
    * match the stdin shape (`text`; no offsets: the reference stream
    * receiver has none either, it acks nothing).
    */
  def socketStream(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream
      .format("socket")
      .option("host", host)
      .option("port", port)
      .load()
      .withColumnRenamed("value", "text")
      .withColumn("path", lit(s"tcp://$host:$port"))
}
