package graft.route

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.zip.{Deflater, DeflaterOutputStream, InflaterInputStream}

import org.apache.spark.sql.{DataFrame, Dataset}

/** The Courier protocol's JDAT wire format
  * (`lc-lib/transports/tcp/courier/protocoljdat.go:109-156`, limits
  * `:47,75`; identity = (16-byte nonce, 1-based sequence) per
  * `docs/Protocol.md:133-224`):
  *
  *   frame   = 'J' 'D' 'A' 'T' | uint32be bodyLen | body
  *   body    = 16-byte nonce | zlib(level 3, events)
  *   events  = repeat( uint32be len | json bytes )
  *
  * The socket transport itself is not rebuilt (table writes are the
  * engine's delivery per the north rule); this is the FORMAT — what a
  * courier-protocol peer would read/write — encodable from any routed
  * frame and round-trippable. Compression is format-valid zlib; byte
  * streams are not guaranteed identical to Go's compressor output
  * (compressors may differ), which the protocol never requires.
  */
object CourierWire {

  /** 10 MiB caps: per frame body and per event (`protocoljdat.go:47,75`). */
  val MaxBodyBytes = 10485760
  val MaxEventBytes = 10485760

  /** Deterministic 16-byte nonce — the reference uses random nonces; a
    * batch engine derives identity from (batchId, partitionId) so retried
    * tasks re-emit the SAME nonce and the receiver's dedup works.
    */
  def nonce(batchId: Long, partitionId: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(16)
    b.putLong(batchId).putInt(partitionId).putInt(0)
    b.array()
  }

  def encodeFrame(events: Seq[Array[Byte]], nonce: Array[Byte]): Array[Byte] = {
    require(nonce.length == 16, "nonce must be 16 bytes")
    events.foreach(e => require(e.length <= MaxEventBytes,
      s"event too large: ${e.length}"))
    val evBuf = new ByteArrayOutputStream()
    val dos = new DataOutputStream(
      new DeflaterOutputStream(evBuf, new Deflater(3)))
    events.foreach { e => dos.writeInt(e.length); dos.write(e) }
    dos.close()
    val body = evBuf.toByteArray
    require(16 + body.length <= MaxBodyBytes, "frame body too large")
    val out = new ByteArrayOutputStream(8 + 16 + body.length)
    val d = new DataOutputStream(out)
    d.writeBytes("JDAT")
    d.writeInt(16 + body.length)
    d.write(nonce)
    d.write(body)
    d.flush()
    out.toByteArray
  }

  /** Returns (nonce, events). Enforces the reference's guards: magic,
    * minimum body of 17 bytes, 10 MiB body and event caps
    * (`protocoljdat.go:42-56,75`).
    */
  def decodeFrame(frame: Array[Byte]): (Array[Byte], Seq[Array[Byte]]) = {
    val in = new DataInputStream(new ByteArrayInputStream(frame))
    val magic = new Array[Byte](4)
    in.readFully(magic)
    require(new String(magic, "US-ASCII") == "JDAT", "protocol error: not a JDAT frame")
    val bodyLen = in.readInt()
    require(bodyLen >= 17, s"protocol error: Corrupt message (JDAT size $bodyLen < 17)")
    require(bodyLen <= MaxBodyBytes, s"protocol error: Message body too large ($bodyLen)")
    val nonce = new Array[Byte](16)
    in.readFully(nonce)
    val z = new DataInputStream(new InflaterInputStream(in))
    val events = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var done = false
    while (!done) {
      val lenOrEof = try z.readInt() catch { case _: java.io.EOFException => done = true; -1 }
      if (!done) {
        require(lenOrEof >= 0 && lenOrEof <= MaxEventBytes, "protocol error: event too large")
        val e = new Array[Byte](lenOrEof)
        z.readFully(e)
        events += e
      }
    }
    (nonce, events.toSeq)
  }

  /** Frame a routed batch: per task partition, wire-JSON events spooled
    * into ≤ `spoolSize`-event frames (`spooler.go:112-125`'s bound), one
    * deterministic nonce per (batch, partition, frame index). The
    * per-partition imperative grouping is genuinely row-sequential —
    * mapPartitions is the right primitive here.
    */
  def frames(df: DataFrame, batchId: Long, spoolSize: Int = 1024): Dataset[Array[Byte]] = {
    import df.sparkSession.implicits._
    val json = df.select(graft.functions.EventJsonEncode.forFrame(df).as("j")).as[String]
    json.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      it.grouped(spoolSize).zipWithIndex.map { case (group, i) =>
        encodeFrame(group.map(_.getBytes("UTF-8")), nonce(batchId, pid * 65536 + i))
      }
    }
  }
}
