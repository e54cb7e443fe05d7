package graft.sources

import java.io.InputStream
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The two line-shaped sources the round-1 survey scoped out as socket
  * machinery, re-expressed with their actual semantics:
  *
  *  - S5 stdin (`lc-lib/stdinharvester/stdinharvester.go:20-44`): a
  *    harvester over `os.Stdin` — one event per line, byte offsets, the
  *    conventional `-` path. Stdin is inherently a single-process feed
  *    and UNBOUNDED, so the driver reads it in bounded chunks and spools
  *    each chunk to a parquet directory; everything downstream (codecs,
  *    actions, routing) consumes the spool with the normal distributed
  *    scan — batch via `read`, continuous via `readStream` (which also
  *    gives stdin the checkpoint/lineage resume semantics the reference
  *    gets from the registrar).
  *  - S7 stream receiver (`lc-lib/transports/tcp/stream/protocol.go:58-77`):
  *    raw newline-delimited text over TCP, one event per line, NO acks
  *    (`NilNonce`) — which is exactly Structured Streaming's `socket`
  *    source contract (at-most-once, no offset tracking).
  */
object Sources {

  /** Spool stdin to parquet in bounded chunks: at most `batchLines` lines
    * (plus their offsets) are ever resident on the driver — a 100 GB pipe
    * streams through in O(batch) memory instead of OOMing a driver-side
    * `toSeq`. Each chunk is one atomic parquet append, so an incremental
    * scan over `spoolDir` picks chunks up as they land. Returns the chunk
    * count.
    *
    * Offsets are registrar-exact (`lc-lib/registrar` records the byte
    * position consumed so far): each line's offset = bytes consumed
    * through its terminator — and a final line that ends at EOF without a
    * newline advances by its bytes only, so resuming at the recorded
    * offset re-reads nothing and skips nothing. CRLF lines strip the
    * `\r` from `text` but count it in the offset (it was consumed).
    *
    * `maxLineBytes` bounds the per-line buffer — WITHOUT it a single
    * newline-free input (a binary file piped to stdin) accumulates the
    * whole stream in one driver-side buffer, defeating the O(batch)
    * claim. An oversized line splits into rune-safe chunks of at most
    * `maxLineBytes`+3 bytes, each its own row — the LineReader splitline
    * behavior (`linereader.go`); offsets keep counting consumed bytes,
    * so registrar math is unchanged.
    */
  def spoolStdin(spark: SparkSession, in: InputStream, spoolDir: String,
      batchLines: Int = 1 << 16, parallelism: Int = 8,
      maxLineBytes: Int = 1 << 20): Int = {
    import spark.implicits._
    // hand-rolled buffer (not BufferedInputStream): the spool loop is the
    // single-threaded ingest hot path, and a synchronized virtual read()
    // per byte would dominate it — this is a plain array index per byte
    val buf = new Array[Byte](1 << 16)
    var bufLen = 0
    var bufPos = 0
    def nextByte(): Int = {
      if (bufLen < 0) return -1 // EOF is sticky (bufPos reset below)
      if (bufPos == bufLen) {
        bufLen = in.read(buf); bufPos = 0
        if (bufLen < 0) return -1
      }
      val b = buf(bufPos); bufPos += 1; b & 0xff
    }
    var off = 0L
    var chunks = 0
    var eof = false
    var carry = -2 // first byte of the rune that overflowed the cap (-2 = none)
    while (!eof) {
      val batch = new scala.collection.mutable.ArrayBuffer[(String, Long)](
        math.min(batchLines, 1 << 16))
      while (!eof && batch.size < batchLines) {
        var b = if (carry != -2) { val c = carry; carry = -2; c } else nextByte()
        if (b == -1) eof = true
        else {
          val bout = new java.io.ByteArrayOutputStream(256)
          var split = false
          while (b != -1 && b != '\n' && !split) {
            // cap with rune-safe overhang: continuation bytes (10xxxxxx)
            // may finish the current rune past the cap (≤ 3 bytes); the
            // first lead byte at/after the cap starts the next chunk.
            // Hard stop at cap+3 regardless of byte class — a newline-free
            // stream of pure continuation bytes (binary piped to stdin)
            // otherwise never satisfies the lead-byte condition and the
            // buffer grows without bound, the exact scenario the cap exists
            // to prevent (a 4-byte rune lead at the cap boundary finishes
            // within 3 continuation bytes, so +3 never splits a valid rune)
            if (bout.size >= maxLineBytes &&
                ((b & 0xc0) != 0x80 || bout.size >= maxLineBytes + 3)) {
              split = true; carry = b
            } else { bout.write(b); b = nextByte() }
          }
          val raw = bout.toByteArray
          val terminated = b == '\n' && !split
          if (!terminated && !split) eof = true
          off += raw.length + (if (terminated) 1 else 0)
          val textLen =
            if (terminated && raw.nonEmpty && raw(raw.length - 1) == '\r') raw.length - 1
            else raw.length
          batch += ((new String(raw, 0, textLen, "UTF-8"), off))
        }
      }
      if (batch.nonEmpty) {
        spark.createDataset(batch.toSeq).toDF("text", "offset")
          .withColumn("path", lit("-"))
          .repartition(parallelism)
          .write.mode("append").parquet(spoolDir)
        chunks += 1
      }
    }
    chunks
  }

  // temp spools created by [[stdin]], swept at JVM exit (the spool is an
  // ingestion buffer, not an output — the reference harvester leaves no
  // on-disk residue either); also sweepable eagerly via [[cleanupSpools]]
  private val pendingSpools = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val sweepHookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => cleanupSpools()))

  /** Delete every temp spool created by [[stdin]] in this JVM. Runs
    * automatically at JVM exit; callers done with the scan may invoke it
    * eagerly.
    */
  def cleanupSpools(): Unit = {
    var dir = pendingSpools.poll()
    while (dir != null) {
      // tolerant: a spool raced by an external sweep is already gone
      graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(dir), tolerant = true)
      dir = pendingSpools.poll()
    }
  }

  /** One event per stdin line with the harvester's running byte offset
    * (offset = end of line in the stream, like the registrar records).
    * Convenience wrapper over [[spoolStdin]] for bounded inputs: spools to
    * a temp directory (swept at JVM exit, or eagerly via
    * [[cleanupSpools]]) and returns the scan — driver memory stays
    * bounded by `batchLines` regardless of input size.
    */
  def stdin(spark: SparkSession, in: InputStream = System.in,
      parallelism: Int = 8, batchLines: Int = 1 << 16): DataFrame = {
    import spark.implicits._
    val spoolDir = Files.createTempDirectory("graft_stdin_spool").toString
    sweepHookInstalled
    pendingSpools.add(spoolDir)
    val chunks = spoolStdin(spark, in, spoolDir, batchLines, parallelism)
    if (chunks == 0)
      Seq.empty[(String, Long)].toDF("text", "offset").withColumn("path", lit("-"))
    else spark.read.parquet(spoolDir)
  }

  /** Newline-delimited TCP text as an unacked event stream — column names
    * match the stdin shape (`text`; no offsets: the reference stream
    * receiver has none either, it acks nothing). Carries the connection
    * metadata the reference attaches under `@metadata[receiver]`
    * (`lc-lib/receiver/metadata_receiver.go:22-32`, `receiver/pool.go:237`)
    * as a `_meta_receiver` struct — meta-prefixed, so every sink strips it
    * (`Router.stripMeta`), exactly like the reference never ships
    * `@metadata` fields.
    */
  def socketStream(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream
      .format("socket")
      .option("host", host)
      .option("port", port)
      .load()
      .withColumnRenamed("value", "text")
      .withColumn("path", lit(s"tcp://$host:$port"))
      .withColumn("_meta_receiver", struct(
        lit(host).as("remote_host"),
        lit(port).as("remote_port"),
        lit("tcp-stream").as("protocol")))
}
