package graft.route

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** JDAT wire-format round-trip — `protocoljdat.go:42-156` framing,
  * limits, and identity semantics.
  */
class CourierWireSpec extends SparkTestBase {
  import spark.implicits._

  test("frame round-trips: magic, nonce, per-event length prefixes, zlib body") {
    val events = Seq("""{"a":1}""", """{"b":"two"}""", "").map(_.getBytes("UTF-8"))
    val n = CourierWire.nonce(42L, 7)
    val frame = CourierWire.encodeFrame(events, n)
    assert(new String(frame.take(4), "US-ASCII") == "JDAT")
    val (nonce, decoded) = CourierWire.decodeFrame(frame)
    assert(nonce.toSeq == n.toSeq)
    assert(decoded.map(new String(_, "UTF-8")) == Seq("""{"a":1}""", """{"b":"two"}""", ""))
  }

  test("guards mirror the reference: short body, bad magic, oversized event") {
    val ok = CourierWire.encodeFrame(Seq("x".getBytes), CourierWire.nonce(1, 1))
    // corrupt magic
    val bad = ok.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](CourierWire.decodeFrame(bad))
    // body < 17 (protocoljdat.go:42-45)
    val short = ok.take(8) ++ Array.fill[Byte](3)(0)
    val shortFixed = {
      val b = java.nio.ByteBuffer.wrap(short)
      b.position(4); b.putInt(3); short
    }
    intercept[Exception](CourierWire.decodeFrame(shortFixed))
    // event above the 10 MiB cap refuses to encode
    intercept[IllegalArgumentException](
      CourierWire.encodeFrame(Seq(new Array[Byte](CourierWire.MaxEventBytes + 1)),
        CourierWire.nonce(1, 1)))
  }

  test("deterministic nonces: a retried (batch, partition) re-emits the same identity") {
    assert(CourierWire.nonce(5L, 3).toSeq == CourierWire.nonce(5L, 3).toSeq)
    assert(CourierWire.nonce(5L, 3).toSeq != CourierWire.nonce(5L, 4).toSeq)
    assert(CourierWire.nonce(5L, 3).length == 16)
  }

  test("nonce slots never collide across partition/frame boundaries") {
    // the old arithmetic packing (pid * 65536 + i) made these equal
    assert(CourierWire.nonce(1L, 1, 0).toSeq != CourierWire.nonce(1L, 0, 65536).toSeq)
    // and overflowed at pid >= 32768
    assert(CourierWire.nonce(1L, 32768, 0).toSeq != CourierWire.nonce(1L, 32767, 65536).toSeq)
    assert(CourierWire.nonce(1L, 3, 7).toSeq == CourierWire.nonce(1L, 3, 7).toSeq)
  }

  test("truncated event-length prefix raises a protocol error instead of silently dropping data") {
    import java.io.{ByteArrayOutputStream, DataOutputStream}
    import java.util.zip.{Deflater, DeflaterOutputStream}
    val evBuf = new ByteArrayOutputStream()
    val dos = new DataOutputStream(new DeflaterOutputStream(evBuf, new Deflater(3)))
    dos.writeInt(3); dos.write("abc".getBytes("UTF-8"))
    dos.writeShort(9) // 2 stray bytes: a prefix truncated mid-write
    dos.close()
    val body = evBuf.toByteArray
    val out = new ByteArrayOutputStream()
    val d = new DataOutputStream(out)
    d.writeBytes("JDAT"); d.writeInt(16 + body.length)
    d.write(CourierWire.nonce(1L, 1)); d.write(body); d.flush()
    val e = intercept[IllegalArgumentException](CourierWire.decodeFrame(out.toByteArray))
    assert(e.getMessage.contains("unexpected end"))
  }

  test("frames() spools a routed batch into bounded frames of wire JSON") {
    val turns = graft.model.TranscriptGen.generate(spark, 9L, 8L, 2).toDF()
    val assigned = Router.stripMeta(graft.TranscriptPipeline.run(spark, turns))
    val total = assigned.count()
    val frames = CourierWire.frames(assigned, batchId = 1L, spoolSize = 50).collect()
    val decoded = frames.flatMap(f => CourierWire.decodeFrame(f)._2)
    assert(decoded.length == total)
    // every event is the wire JSON (parses, carries conv_id)
    val node = graft.functions.JsonFlatten.mapper.readTree(new String(decoded.head, "UTF-8"))
    assert(node.has("conv_id") && node.has("text"))
    // spool bound respected
    frames.foreach(f => assert(CourierWire.decodeFrame(f)._2.length <= 50))
  }

  test("decodeFrame reads exactly the declared body: smuggled tails and length mismatches are protocol errors") {
    val good = CourierWire.encodeFrame(
      Seq("a".getBytes, "bb".getBytes), CourierWire.nonce(1L, 0, 0))
    // trailing bytes after the declared body length
    val tail = good ++ Array[Byte](1, 2, 3)
    val e1 = intercept[IllegalArgumentException](CourierWire.decodeFrame(tail))
    assert(e1.getMessage.contains("trailing bytes"))
    // frame truncated inside the declared body (cut mid-zlib)
    val cut = good.take(good.length - 3)
    val e2 = intercept[IllegalArgumentException](CourierWire.decodeFrame(cut))
    assert(e2.getMessage.contains("shorter than its declared body"))
    // truncated before the nonce completes: protocol error, not raw EOF
    val tiny = good.take(8 + 7)
    val e3 = intercept[IllegalArgumentException](CourierWire.decodeFrame(tiny))
    assert(e3.getMessage.contains("protocol error"))
  }

  test("EVNT framing round-trips and cross-checks against JDAT (protocolevnt.go:33-144)") {
    val events = Seq("""{"a":1}""", """{"b":"two"}""", "").map(_.getBytes("UTF-8"))
    val n = CourierWire.nonce(42L, 7)
    val evnt = CourierWire.encodeFrameEvnt(events, n)
    // header: magic + the 0xFFFFFFFF stream sentinel + UNCOMPRESSED nonce
    assert(new String(evnt.take(4), "US-ASCII") == "EVNT")
    assert(java.nio.ByteBuffer.wrap(evnt, 4, 4).getInt == CourierWire.EvntStreamSentinel)
    assert(evnt.slice(8, 24).toSeq == n.toSeq)
    val (nonce, decoded) = CourierWire.decodeFrameEvnt(evnt)
    assert(nonce.toSeq == n.toSeq)
    assert(decoded.map(new String(_, "UTF-8")) == events.map(new String(_, "UTF-8")))
    // the two framings carry identical payloads: decode both, compare
    val jdat = CourierWire.encodeFrame(events, n)
    val (jn, je) = CourierWire.decodeFrame(jdat)
    assert(jn.toSeq == nonce.toSeq)
    assert(je.map(_.toSeq) == decoded.map(_.toSeq))
    // auto-dispatch routes on the magic like the receiver's message switch
    val (t1, _, e1) = CourierWire.decodeFrameAuto(evnt)
    val (t2, _, e2) = CourierWire.decodeFrameAuto(jdat)
    assert(t1 == "EVNT" && t2 == "JDAT")
    assert(e1.map(_.toSeq) == e2.map(_.toSeq))
    intercept[IllegalArgumentException](CourierWire.decodeFrameAuto("XXXX????".getBytes))
  }

  test("EVNT guards: non-sentinel length field, truncated nonce, oversized event, 10 MiB cap") {
    val n = CourierWire.nonce(1L, 0)
    val good = CourierWire.encodeFrameEvnt(Seq("x".getBytes), n)
    // length field must be the stream sentinel (protocolevnt.go:44-46)
    val badLen = good.clone()
    java.nio.ByteBuffer.wrap(badLen, 4, 4).putInt(12345)
    val e1 = intercept[IllegalArgumentException](CourierWire.decodeFrameEvnt(badLen))
    assert(e1.getMessage.contains("EVNT size"))
    // truncated before the nonce completes
    val e2 = intercept[IllegalArgumentException](CourierWire.decodeFrameEvnt(good.take(8 + 7)))
    assert(e2.getMessage.contains("protocol error"))
    // per-event 10 MiB cap refuses to encode (protocolevnt.go:73-75)
    intercept[IllegalArgumentException](
      CourierWire.encodeFrameEvnt(Seq(new Array[Byte](CourierWire.MaxEventBytes + 1)), n))
    // JDAT decoder refuses an EVNT frame and vice versa
    intercept[IllegalArgumentException](CourierWire.decodeFrame(good))
    intercept[IllegalArgumentException](
      CourierWire.decodeFrameEvnt(CourierWire.encodeFrame(Seq("x".getBytes), n)))
    // a payload too large for a JDAT declaration still streams as EVNT:
    // ~12 MiB of incompressible events (JDAT's 10 MiB body cap trips)
    val rnd = new scala.util.Random(3)
    val big = (0 until 12).map { _ =>
      val b = new Array[Byte](1 << 20); rnd.nextBytes(b); b
    }
    intercept[IllegalArgumentException](CourierWire.encodeFrame(big, n))
    val (_, back) = CourierWire.decodeFrameEvnt(CourierWire.encodeFrameEvnt(big, n))
    assert(back.length == 12 && back.zip(big).forall { case (a, b) => a.sameElements(b) })
  }

  test("control frames: HELO/VERS/PING/PONG/UNKN/ACKN round-trip with their size contracts") {
    import CourierWire._
    // HELO/VERS carry the 32-byte negotiation body
    val hs = handshake(client = "LCOR", supportsEvnt = true, major = 2, minor = 12, patch = 1)
    val helo = encodeControl(Helo(hs))
    assert(helo.length == 40 && new String(helo.take(4), "US-ASCII") == "HELO")
    val Helo(back) = decodeControl(helo): @unchecked
    assert(back.supportsEvnt && back.major == 2 && back.minor == 12 && back.patch == 1)
    assert(back.clientName == "Log Courier v2.12.1") // common.go:30-35 mapping
    val Vers(v) = decodeControl(encodeControl(Vers(handshake(supportsEvnt = false)))): @unchecked
    assert(!v.supportsEvnt && v.clientName == "Log Carver v2.0.0")
    // a SHORT (even empty) HELO body reads as zeros: anonymous non-EVNT
    // peer (protocolhelo.go:50-57, protocolvers.go:113-118)
    val anon = decodeControl("HELO".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0))
    val Helo(a) = anon: @unchecked
    assert(!a.supportsEvnt && a.clientName == "Unknown")
    // keepalive + unknown-type reply are empty-bodied; nonzero size is corrupt
    for (c <- Seq[Control](Ping, Pong, Unkn)) {
      val f = encodeControl(c)
      assert(f.length == 8 && decodeControl(f) == c)
      val bad = f ++ Array[Byte](1)
      intercept[IllegalArgumentException](decodeControl(bad))
    }
    assert(new String(encodeControl(Unkn).take(4), "US-ASCII") == "????") // protocolunkn.go:47
    // ACKN: 16-byte nonce + uint32be sequence, exactly 20 (protocolackn.go:39-41)
    val n = nonce(9L, 3, 1)
    val ack = encodeControl(Ackn(n, 0xfffffffeL))
    assert(ack.length == 28)
    val Ackn(an, seq) = decodeControl(ack): @unchecked
    assert(an.toSeq == n.toSeq && seq == 0xfffffffeL) // uint32 survives the round trip
    val badAck = encodeControl(Ackn(n, 7)).dropRight(1)
    intercept[IllegalArgumentException](decodeControl(badAck))
    intercept[IllegalArgumentException](encodeControl(Ackn(n, 0x100000000L)))
    intercept[IllegalArgumentException](decodeControl("XXXX    ".getBytes("US-ASCII")))
  }

  test("negotiation: EVNT iff both sides advertise it; UNKN reply = legacy JDAT peer (protocol.go:79-110)") {
    import CourierWire._
    val evntSide = handshake(supportsEvnt = true)
    val legacySide = handshake(supportsEvnt = false)
    assert(negotiatedFraming(evntSide, Vers(evntSide)) == "EVNT")
    assert(negotiatedFraming(evntSide, Vers(legacySide)) == "JDAT")
    assert(negotiatedFraming(legacySide, Vers(evntSide)) == "JDAT")
    assert(negotiatedFraming(evntSide, Unkn) == "JDAT")
    intercept[IllegalArgumentException](negotiatedFraming(evntSide, Ping))
    // the negotiated framing drives which encoder a sender uses — and
    // both carry identical payloads (SendEvents, protocol.go:113-131)
    val events = Seq("""{"x":1}""".getBytes("UTF-8"))
    val nn = nonce(1L, 0)
    val framed = negotiatedFraming(evntSide, Vers(evntSide)) match {
      case "EVNT" => encodeFrameEvnt(events, nn)
      case _ => encodeFrame(events, nn)
    }
    val (kind, _, decoded) = decodeFrameAuto(framed)
    assert(kind == "EVNT" && decoded.head.toSeq == events.head.toSeq)
  }

  test("frames flush on the byte budget too: incompressible large events never breach the frame cap") {
    // 64 events of ~200KB of pseudo-random (incompressible) base64-ish
    // text: count alone (spoolSize 1024) would pack ~12.8MB into one
    // frame and trip encodeFrame's 10MiB body cap
    val rnd = new scala.util.Random(7)
    val rows = (0 until 64).map { i =>
      val sb = new StringBuilder
      while (sb.length < 200000) sb.append(java.lang.Long.toUnsignedString(rnd.nextLong(), 36))
      (s"c$i", 0, "user", sb.toString, "none", new java.sql.Timestamp(1767225600000L))
    }
    import spark.implicits._
    val df = rows.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val assigned = Router.stripMeta(graft.TranscriptPipeline.run(spark, df))
    val frames = CourierWire.frames(assigned, batchId = 9L,
      spoolSize = 1024, spoolMaxBytes = 1L << 20).collect() // 1MiB budget
    assert(frames.length >= 13, s"64 x ~200KB under a 1MiB budget must split, got ${frames.length} frames")
    val decoded = frames.flatMap(f => CourierWire.decodeFrame(f)._2)
    assert(decoded.length == 64, "no event lost or duplicated across the byte-bound flushes")
    frames.foreach(f => assert(f.length <= CourierWire.MaxBodyBytes))
  }
}
