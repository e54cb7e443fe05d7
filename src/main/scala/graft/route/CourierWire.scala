package graft.route

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.zip.{Deflater, DeflaterOutputStream, InflaterInputStream}

import org.apache.spark.sql.{DataFrame, Dataset}

/** The Courier protocol's TWO payload framings
  * (`lc-lib/transports/tcp/courier/protocoljdat.go:109-156`, limits
  * `:47,75`; `protocolevnt.go:33-96,109-144`; identity = (16-byte
  * nonce, 1-based sequence) per `docs/Protocol.md:133-224`):
  *
  *   JDAT    = 'J' 'D' 'A' 'T' | uint32be bodyLen | body
  *   body    = 16-byte nonce | zlib(level 3, events)
  *   EVNT    = 'E' 'V' 'N' 'T' | uint32be 0xFFFFFFFF | 16-byte nonce
  *             | zlib(level 3, events)        (streamed: no size prefix)
  *   events  = repeat( uint32be len | json bytes )
  *
  * EVNT is the enhanced sibling: the length field is pinned to the
  * 0xFFFFFFFF stream sentinel (`protocolevnt.go:44-46,116`) and the
  * body has NO declared length — a reader consumes the zlib stream to
  * its end, so payloads are not bounded by a 10 MiB frame declaration
  * (the per-EVENT 10 MiB cap still applies, `protocolevnt.go:73-75`).
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
    * batch engine derives identity from (batchId, partitionId, frameIdx)
    * so retried tasks re-emit the SAME nonce and the receiver's dedup
    * works. Each component gets its own byte slot (8+4+4) — arithmetic
    * packing (`pid * 65536 + i`) overflows at partition ids ≥ 32768 and
    * collides with the next partition once a partition emits ≥ 65536
    * frames, silently breaking the dedup identity.
    */
  def nonce(batchId: Long, partitionId: Int, frameIdx: Int = 0): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(16)
    b.putLong(batchId).putInt(partitionId).putInt(frameIdx)
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
    try in.readFully(magic)
    catch { case _: java.io.EOFException =>
      throw new IllegalArgumentException("protocol error: truncated frame header") }
    require(new String(magic, "US-ASCII") == "JDAT", "protocol error: not a JDAT frame")
    val bodyLen = in.readInt()
    require(bodyLen >= 17, s"protocol error: Corrupt message (JDAT size $bodyLen < 17)")
    require(bodyLen <= MaxBodyBytes, s"protocol error: Message body too large ($bodyLen)")
    // read EXACTLY the declared body — the reference reads data[:bodyLen]
    // and inflates data[16:] (protocoljdat.go); inflating the unbounded
    // remaining stream would let a frame declaring a tiny bodyLen smuggle
    // an arbitrarily large compressed payload past the cap just checked,
    // and a declared/actual length mismatch must be a protocol error,
    // not a silent read or a raw EOFException
    val nonce = new Array[Byte](16)
    val zbytes = new Array[Byte](bodyLen - 16)
    try { in.readFully(nonce); in.readFully(zbytes) }
    catch { case _: java.io.EOFException =>
      throw new IllegalArgumentException(
        "protocol error: frame shorter than its declared body length") }
    require(in.read() < 0,
      "protocol error: trailing bytes after the declared body length")
    (nonce, readEventStream(new ByteArrayInputStream(zbytes)))
  }

  /** The shared compressed event-stream walk (both framings carry the
    * same `repeat(uint32be len | bytes)` inside zlib).
    */
  private def readEventStream(compressed: java.io.InputStream): Seq[Array[Byte]] = {
    val z = new DataInputStream(new InflaterInputStream(compressed))
    val events = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var done = false
    while (!done) {
      // read the 4-byte length prefix byte-wise: EOF before ANY prefix
      // byte is the clean end of the event stream; EOF after 1-3 prefix
      // bytes is a truncated frame and must raise, not silently drop —
      // mirrors the reference's clean-EOF vs ErrUnexpectedEnd distinction
      val b0 = z.read()
      if (b0 < 0) done = true
      else {
        val rest = new Array[Byte](3)
        try z.readFully(rest)
        catch {
          case _: java.io.EOFException =>
            throw new IllegalArgumentException(
              "protocol error: unexpected end of frame inside an event length prefix")
        }
        val len = ((b0 & 0xff) << 24) | ((rest(0) & 0xff) << 16) |
          ((rest(1) & 0xff) << 8) | (rest(2) & 0xff)
        require(len >= 0 && len <= MaxEventBytes, "protocol error: event too large")
        val e = new Array[Byte](len)
        try z.readFully(e)
        catch {
          case _: java.io.EOFException =>
            throw new IllegalArgumentException(
              "protocol error: unexpected end of frame inside an event body")
        }
        events += e
      }
    }
    events.toSeq
  }

  /** The EVNT stream sentinel: the length field of every EVNT frame
    * (`protocolevnt.go:44-46` rejects anything else).
    */
  val EvntStreamSentinel: Int = 0xffffffff

  /** Encode the EVNT framing (`protocolevnt.go:109-144`): magic, the
    * 0xFFFFFFFF stream sentinel where JDAT declares a body length, the
    * nonce UNCOMPRESSED, then the level-3 zlib event stream. No body cap
    * — the framing exists to stream payloads without a size declaration;
    * the per-event 10 MiB cap still holds on both sides.
    */
  def encodeFrameEvnt(events: Seq[Array[Byte]], nonce: Array[Byte]): Array[Byte] = {
    require(nonce.length == 16, "nonce must be 16 bytes")
    events.foreach(e => require(e.length <= MaxEventBytes,
      s"event too large: ${e.length}"))
    val out = new ByteArrayOutputStream()
    val d = new DataOutputStream(out)
    d.writeBytes("EVNT")
    d.writeInt(EvntStreamSentinel)
    d.write(nonce)
    d.flush()
    val dos = new DataOutputStream(
      new DeflaterOutputStream(out, new Deflater(3)))
    events.foreach { e => dos.writeInt(e.length); dos.write(e) }
    dos.close()
    out.toByteArray
  }

  /** Returns (nonce, events) from an EVNT frame. Guards mirror
    * `protocolevnt.go:44-46,73-75`: the length field must be the stream
    * sentinel, events are capped at 10 MiB, and a truncated stream is a
    * protocol error, not a silent drop.
    */
  def decodeFrameEvnt(frame: Array[Byte]): (Array[Byte], Seq[Array[Byte]]) = {
    val in = new DataInputStream(new ByteArrayInputStream(frame))
    val magic = new Array[Byte](4)
    try in.readFully(magic)
    catch { case _: java.io.EOFException =>
      throw new IllegalArgumentException("protocol error: truncated frame header") }
    require(new String(magic, "US-ASCII") == "EVNT", "protocol error: not an EVNT frame")
    val lenField = in.readInt()
    require(lenField == EvntStreamSentinel,
      s"protocol error: Corrupt message (EVNT size ${lenField.toLong & 0xffffffffL} != ${EvntStreamSentinel.toLong & 0xffffffffL})")
    val nonce = new Array[Byte](16)
    try in.readFully(nonce)
    catch { case _: java.io.EOFException =>
      throw new IllegalArgumentException(
        "protocol error: EVNT frame shorter than its 16-byte nonce") }
    (nonce, readEventStream(in))
  }

  /** Dispatch on the 4-byte magic: returns (framing, nonce, events) for
    * either payload framing — what a courier-protocol receiver's message
    * switch does (`connection.go` routes on the header's first 4 bytes).
    */
  def decodeFrameAuto(frame: Array[Byte]): (String, Array[Byte], Seq[Array[Byte]]) = {
    require(frame.length >= 4, "protocol error: truncated frame header")
    new String(frame, 0, 4, "US-ASCII") match {
      case "JDAT" => val (n, e) = decodeFrame(frame); ("JDAT", n, e)
      case "EVNT" => val (n, e) = decodeFrameEvnt(frame); ("EVNT", n, e)
      case other => throw new IllegalArgumentException(
        s"protocol error: unknown message type '$other'")
    }
  }

  // =====================================================================
  // Control frames — the non-payload half of the protocol: negotiation
  // (HELO/VERS/UNKN), keepalive (PING/PONG) and acknowledgement (ACKN).
  // Formats per `protocolhelo.go`/`protocolvers.go` (32-byte body:
  // 4 flags | 3×uint32be version | 4-char client | 12 reserved),
  // `protocolping.go`/`protocolpong.go`/`protocolunkn.go` (empty body),
  // `protocolackn.go` (20-byte body: 16-byte nonce | uint32be sequence).
  // =====================================================================

  sealed trait Control
  final case class Helo(hs: Handshake) extends Control
  final case class Vers(hs: Handshake) extends Control
  case object Ping extends Control
  case object Pong extends Control
  /** The reply a pre-handshake receiver sends to a message type it does
    * not understand (`protocolunkn.go`) — negotiation treats it as "no
    * handshake support" rather than an error (`protocol.go:93-98`).
    */
  case object Unkn extends Control
  final case class Ackn(nonce: Array[Byte], sequence: Long) extends Control

  /** Short→full client-name mapping (`common.go:30-35`). */
  val ClientNames: Map[String, String] = Map(
    "LCOR" -> "Log Courier", "LCVR" -> "Log Carver", "RYLC" -> "Ruby Log Courier")

  /** The 32-byte HELO/VERS negotiation body. `flags(0) & 0x01` is the
    * SupportsEVNT bit (`protocolvers.go:38-41`); a NUL-leading client is
    * an anonymous peer (`protocolvers.go:113-126`).
    */
  final case class Handshake(flags: Array[Byte], major: Long, minor: Long,
      patch: Long, client: String) {
    require(flags.length == 4, "handshake flags must be 4 bytes")
    require(client.length == 4, "client identifier must be 4 characters")
    def supportsEvnt: Boolean = (flags(0) & 0x01) != 0
    def clientName: String =
      if (client.charAt(0) == '\u0000') {
        if (major == 0 && minor == 0 && patch == 0) "Unknown"
        else s"Unknown v$major.$minor.$patch"
      } else s"${ClientNames.getOrElse(client, client)} v$major.$minor.$patch"
  }

  /** Our announcement: EVNT-capable by default, like `createProtocolVERS`. */
  def handshake(client: String = "LCVR", supportsEvnt: Boolean = true,
      major: Long = 2, minor: Long = 0, patch: Long = 0): Handshake =
    Handshake(Array[Byte](if (supportsEvnt) 1 else 0, 0, 0, 0),
      major, minor, patch, client)

  def encodeControl(c: Control): Array[Byte] = {
    val out = new ByteArrayOutputStream(40)
    val d = new DataOutputStream(out)
    c match {
      case Helo(hs) => d.writeBytes("HELO"); d.writeInt(32); writeHandshake(d, hs)
      case Vers(hs) => d.writeBytes("VERS"); d.writeInt(32); writeHandshake(d, hs)
      case Ping => d.writeBytes("PING"); d.writeInt(0)
      case Pong => d.writeBytes("PONG"); d.writeInt(0)
      case Unkn => d.writeBytes("????"); d.writeInt(0)
      case Ackn(nonce, seq) =>
        require(nonce.length == 16, "nonce must be 16 bytes")
        require(seq >= 0 && seq <= 0xffffffffL, s"sequence out of uint32 range: $seq")
        d.writeBytes("ACKN"); d.writeInt(20); d.write(nonce); d.writeInt(seq.toInt)
    }
    d.flush()
    out.toByteArray
  }

  private def writeHandshake(d: DataOutputStream, hs: Handshake): Unit = {
    d.write(hs.flags)
    d.writeInt(hs.major.toInt); d.writeInt(hs.minor.toInt); d.writeInt(hs.patch.toInt)
    d.writeBytes(hs.client)
    d.write(new Array[Byte](12)) // reserved
  }

  /** Decode a control frame, enforcing each type's size contract: ACKN
    * exactly 20 (`protocolackn.go:39-41`), PING/PONG/the UNKN reply
    * exactly 0, HELO/VERS at most 32 with missing bytes read as zero
    * (`protocolhelo.go:50-57` — an empty HELO is a legal anonymous
    * non-EVNT peer).
    */
  def decodeControl(frame: Array[Byte]): Control = {
    require(frame.length >= 8, "protocol error: truncated frame header")
    val magic = new String(frame, 0, 4, "US-ASCII")
    val bodyLen = java.nio.ByteBuffer.wrap(frame, 4, 4).getInt
    require(bodyLen == frame.length - 8,
      s"protocol error: $magic declares $bodyLen body bytes, carries ${frame.length - 8}")
    def handshakeBody(): Handshake = {
      require(bodyLen <= 32, s"protocol error: Corrupt message ($magic size $bodyLen > 32)")
      val data = new Array[Byte](32)
      System.arraycopy(frame, 8, data, 0, bodyLen)
      val b = java.nio.ByteBuffer.wrap(data)
      val flags = new Array[Byte](4); b.get(flags)
      Handshake(flags, b.getInt & 0xffffffffL, b.getInt & 0xffffffffL,
        b.getInt & 0xffffffffL, new String(data, 16, 4, "US-ASCII"))
    }
    def empty(c: Control): Control = {
      require(bodyLen == 0, s"protocol error: Corrupt message $magic size $bodyLen != 0")
      c
    }
    magic match {
      case "HELO" => Helo(handshakeBody())
      case "VERS" => Vers(handshakeBody())
      case "PING" => empty(Ping)
      case "PONG" => empty(Pong)
      case "????" => empty(Unkn)
      case "ACKN" =>
        require(bodyLen == 20, s"protocol error: Corrupt message (ACKN size $bodyLen != 20)")
        Ackn(frame.slice(8, 24), java.nio.ByteBuffer.wrap(frame, 24, 4).getInt & 0xffffffffL)
      case other => throw new IllegalArgumentException(
        s"protocol error: unknown message type '$other'")
    }
  }

  /** Client-side negotiation outcome (`protocol.go:79-110`): we sent
    * HELO; a VERS reply selects EVNT iff BOTH sides advertise it, the
    * UNKN reply means a pre-handshake peer (JDAT, no error), anything
    * else is a protocol violation.
    */
  def negotiatedFraming(ours: Handshake, reply: Control): String = reply match {
    case Vers(hs) => if (ours.supportsEvnt && hs.supportsEvnt) "EVNT" else "JDAT"
    case Unkn => "JDAT"
    case other => throw new IllegalArgumentException(
      s"unexpected $other reply to negotiation, expected VERS")
  }

  /** Default per-frame byte budget for [[frames]]: the body cap minus
    * the nonce and a worst-case zlib expansion margin (stored blocks add
    * ~5 bytes per 64 KiB on incompressible input — ~800 bytes at 10 MiB;
    * 8 KiB is ample), so `encodeFrame`'s cap cannot trip on data that
    * merely refused to compress.
    */
  val DefaultSpoolBytes: Long = (MaxBodyBytes - 16 - 8192).toLong

  /** Frame a routed batch: per task partition, wire-JSON events spooled
    * into frames bounded BOTH by event count and by accumulated event
    * bytes (the reference spooler flushes on `spoolSize` events OR
    * `spoolMaxBytes` bytes, `spooler.go:112-125` — count alone lets a
    * batch of large events compress into a body past the 10 MiB frame
    * cap and kill the task on every retry), one deterministic nonce per
    * (batch, partition, frame index). The per-partition imperative
    * grouping is genuinely row-sequential — mapPartitions is the right
    * primitive here. A single event larger than the byte budget ships
    * alone; `encodeFrame`'s caps stay the final guard.
    */
  def frames(df: DataFrame, batchId: Long, spoolSize: Int = 1024,
      spoolMaxBytes: Long = DefaultSpoolBytes): Dataset[Array[Byte]] = {
    import df.sparkSession.implicits._
    val json = df.select(graft.functions.EventJsonEncode.forFrame(df).as("j")).as[String]
    json.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val bytesIt = it.map(_.getBytes("UTF-8")).buffered
      new Iterator[Array[Byte]] {
        private var idx = 0
        override def hasNext: Boolean = bytesIt.hasNext
        override def next(): Array[Byte] = {
          val group = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          var bytes = 0L
          while (bytesIt.hasNext && group.length < spoolSize &&
              (group.isEmpty ||
                bytes + bytesIt.head.length + 4 <= spoolMaxBytes)) {
            val e = bytesIt.next()
            group += e
            bytes += e.length + 4 // 4-byte length prefix rides in the body
          }
          val f = encodeFrame(group.toSeq, nonce(batchId, pid, idx))
          idx += 1
          f
        }
      }
    }
  }
}
