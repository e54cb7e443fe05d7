package graft.enrich

/** Pure-JVM reader for the public MaxMind-DB binary format
  * (https://maxmind.github.io/MaxMind-DB/ — metadata map, binary search
  * tree, data section), so the `geoip` action can load a real GeoIP2 /
  * GeoLite2 `.mmdb` file exactly like the reference
  * (`lc-lib/processor/actiongeoip.go:88-168` via the official Go reader).
  *
  * Read-only and allocation-light: the whole file is one byte array
  * (GeoLite2-City is ~70 MB — comfortably executor-resident); lookups
  * walk the tree bit-by-bit and decode lazily. Instances are cached
  * per-JVM by path ([[Mmdb.cached]]) so a plan referencing the database
  * ships only the PATH to executors, never the bytes — at 1000 executors
  * the file rides local disk (`spark-submit --files`), not the closure.
  */
final class MmdbReader(data: Array[Byte]) {

  // ---- metadata ----------------------------------------------------
  private val MetadataMarker: Array[Byte] =
    Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++ "MaxMind.com".getBytes("US-ASCII")

  private val metadataStart: Int = {
    // the marker's LAST occurrence (the spec allows it to appear in data)
    var i = data.length - MetadataMarker.length
    var found = -1
    while (found < 0 && i >= 0) {
      var j = 0
      while (j < MetadataMarker.length && data(i + j) == MetadataMarker(j)) j += 1
      if (j == MetadataMarker.length) found = i + MetadataMarker.length
      i -= 1
    }
    require(found >= 0, "not a MaxMind-DB file: metadata marker missing")
    found
  }

  /** The decoded metadata map (node_count, record_size, ip_version, ...). */
  val metadata: java.util.Map[String, Any] = {
    val d = new Decoder(metadataStart) // pointers never occur in metadata
    d.decode().asInstanceOf[java.util.Map[String, Any]]
  }

  val nodeCount: Int = metadata.get("node_count").asInstanceOf[Long].toInt
  val recordSizeBits: Int = metadata.get("record_size").asInstanceOf[Long].toInt
  val ipVersion: Int = metadata.get("ip_version").asInstanceOf[Long].toInt
  require(recordSizeBits == 24 || recordSizeBits == 28 || recordSizeBits == 32,
    s"unsupported record_size $recordSizeBits")
  private val nodeBytes = recordSizeBits * 2 / 8
  private val searchTreeSize = nodeCount * nodeBytes
  private val dataSectionStart = searchTreeSize + 16
  // construction-time structural sanity: a truncated or corrupt file
  // fails HERE with the actual contract, not as an index error deep in
  // a per-row lookup
  require(searchTreeSize >= 0 && dataSectionStart <= metadataStart,
    s"corrupt MaxMind-DB: search tree ($searchTreeSize B) + 16 B separator " +
      s"exceeds the pre-metadata region ($metadataStart B of ${data.length} B)")

  // ---- search tree --------------------------------------------------
  private def u8(i: Int): Int = data(i) & 0xff

  /** Record `side` (0 = left, 1 = right) of node `node`. */
  private def record(node: Int, side: Int): Int = {
    val base = node * nodeBytes
    recordSizeBits match {
      case 24 =>
        val o = base + side * 3
        (u8(o) << 16) | (u8(o + 1) << 8) | u8(o + 2)
      case 28 =>
        if (side == 0)
          ((u8(base + 3) >> 4) << 24) | (u8(base) << 16) | (u8(base + 1) << 8) | u8(base + 2)
        else
          ((u8(base + 3) & 0x0f) << 24) | (u8(base + 4) << 16) | (u8(base + 5) << 8) | u8(base + 6)
      case 32 =>
        val o = base + side * 4
        (u8(o) << 24) | (u8(o + 1) << 16) | (u8(o + 2) << 8) | u8(o + 3)
    }
  }

  /** Node reached after the 96 zero bits that prefix an IPv4 address in
    * an IPv6 tree (the ::/96 convention); the root for an IPv4 tree.
    */
  private val ipv4Root: Int = {
    var node = 0
    if (ipVersion == 6) {
      var i = 0
      while (i < 96 && node < nodeCount) { node = record(node, 0); i += 1 }
    }
    node
  }

  /** Look up an address (4- or 16-byte form). None = no record. */
  def lookup(addr: Array[Byte]): Option[Any] = {
    require(addr.length == 4 || addr.length == 16, s"bad address length ${addr.length}")
    if (addr.length == 16 && ipVersion == 4) return None
    var node = if (addr.length == 4) ipv4Root else 0
    var bit = 0
    val nBits = addr.length * 8
    while (bit < nBits && node < nodeCount) {
      val b = (addr(bit >> 3) >> (7 - (bit & 7))) & 1
      node = record(node, b)
      bit += 1
    }
    if (node == nodeCount) None // the no-data sentinel
    else if (node < nodeCount) None // ran out of bits mid-tree (malformed)
    else
      try Some(decodeAt(node - nodeCount + searchTreeSize))
      catch {
        case e: IndexOutOfBoundsException =>
          // truncated data section: fail with the contract, not a bare
          // index error from inside a per-row expression
          throw new IllegalArgumentException(
            s"corrupt MaxMind-DB: data record at tree value $node reads past " +
              s"the file (${data.length} B)", e)
      }
  }

  def lookup(ip: String): Option[Any] =
    parseIp(ip).flatMap(lookup)

  /** `net.ParseIP` analog without DNS: dotted-quad or RFC-4291 colon hex. */
  def parseIp(s: String): Option[Array[Byte]] = MmdbCityLookup.ipBytes(s)

  /** Enumerate every data-bearing IPv4 network as (cidr, decoded value) —
    * the broadcast-lookup build side. Bounded by the database itself
    * (GeoLite2-City ≈ 3M networks); decoded values are memoised by data
    * offset so shared records decode once.
    */
  def ipv4Networks(): Seq[(String, Any)] = {
    val out = Seq.newBuilder[(String, Any)]
    val memo = new java.util.HashMap[Integer, Any]()
    def walk(node: Int, prefix: Long, depth: Int): Unit = {
      if (node == nodeCount) return
      if (node > nodeCount) {
        val off = node - nodeCount + searchTreeSize
        val v = memo.computeIfAbsent(off, o => decodeAt(o))
        val ip = prefix << (32 - depth)
        out += (f"${(ip >> 24) & 0xff}%d.${(ip >> 16) & 0xff}%d.${(ip >> 8) & 0xff}%d.${ip & 0xff}%d/$depth%d" -> v)
        return
      }
      if (depth >= 32) return
      walk(record(node, 0), prefix << 1, depth + 1)
      walk(record(node, 1), (prefix << 1) | 1, depth + 1)
    }
    walk(ipv4Root, 0L, 0)
    out.result()
  }

  // ---- data section decoder -----------------------------------------
  def decodeAt(absoluteOffset: Int): Any = new Decoder(absoluteOffset).decode()

  /** One decode pass; `pos` advances as values are read. Control byte:
    * top 3 bits type (0 = extended: next byte + 7), low 5 bits size with
    * 29/30/31 escape forms. Pointers resolve relative to the data
    * section and decode in place (without moving `pos` past the pointer
    * bytes themselves).
    */
  private final class Decoder(start: Int) {
    private var pos = start

    def decode(): Any = {
      val ctrl = u8(pos); pos += 1
      var typ = ctrl >> 5
      if (typ == 0) { typ = u8(pos) + 7; pos += 1 }
      if (typ == 1) return decodePointer(ctrl)
      val size = decodeSize(ctrl)
      typ match {
        case 2 => // UTF-8 string
          val s = new String(data, pos, size, "UTF-8"); pos += size; s
        case 3 => // double
          require(size == 8, s"double must be 8 bytes, got $size")
          val v = java.lang.Double.longBitsToDouble(beLong(pos, 8)); pos += 8; v
        case 4 => // bytes
          val b = java.util.Arrays.copyOfRange(data, pos, pos + size); pos += size; b
        case 5 | 6 | 9 => // uint16 / uint32 / uint64 (as Long; uint64 may wrap)
          val v = beLong(pos, size); pos += size; java.lang.Long.valueOf(v)
        case 7 => // map
          val m = new java.util.LinkedHashMap[String, Any]()
          var i = 0
          while (i < size) {
            val k = decode()
            require(k.isInstanceOf[String], s"map key must be a string, got $k")
            m.put(k.asInstanceOf[String], decode())
            i += 1
          }
          m
        case 8 => // int32 (big-endian, sign-extended)
          var v = 0L; var i = 0
          while (i < size) { v = (v << 8) | u8(pos + i); i += 1 }
          pos += size
          if (size == 4) java.lang.Long.valueOf(v.toInt.toLong) else java.lang.Long.valueOf(v)
        case 10 => // uint128
          val b = java.util.Arrays.copyOfRange(data, pos, pos + size); pos += size
          new java.math.BigInteger(1, b)
        case 11 => // array
          val a = new java.util.ArrayList[Any](size)
          var i = 0
          while (i < size) { a.add(decode()); i += 1 }
          a
        case 14 => java.lang.Boolean.valueOf(size != 0) // bool: size IS the value
        case 15 => // float
          require(size == 4, s"float must be 4 bytes, got $size")
          val v = java.lang.Float.intBitsToFloat(beLong(pos, 4).toInt); pos += 4
          java.lang.Double.valueOf(v.toDouble)
        case other => throw new IllegalArgumentException(s"unsupported mmdb type $other")
      }
    }

    private def decodeSize(ctrl: Int): Int = {
      val s = ctrl & 0x1f
      if (s < 29) s
      else if (s == 29) { val v = 29 + u8(pos); pos += 1; v }
      else if (s == 30) { val v = 285 + ((u8(pos) << 8) | u8(pos + 1)); pos += 2; v }
      else { val v = 65821 + ((u8(pos) << 16) | (u8(pos + 1) << 8) | u8(pos + 2)); pos += 3; v }
    }

    private def decodePointer(ctrl: Int): Any = {
      val sz = (ctrl >> 3) & 0x3
      val vvv = ctrl & 0x7
      val target = sz match {
        case 0 => val v = (vvv << 8) | u8(pos); pos += 1; v
        case 1 => val v = ((vvv << 16) | (u8(pos) << 8) | u8(pos + 1)) + 2048; pos += 2; v
        case 2 =>
          val v = ((vvv << 24) | (u8(pos) << 16) | (u8(pos + 1) << 8) | u8(pos + 2)) + 526336
          pos += 3; v
        case _ =>
          val v = (u8(pos) << 24) | (u8(pos + 1) << 16) | (u8(pos + 2) << 8) | u8(pos + 3)
          pos += 4; v
      }
      new Decoder(dataSectionStart + target).decode()
    }

    private def beLong(off: Int, n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | u8(off + i); i += 1 }
      v
    }
  }
}

object Mmdb {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, MmdbReader]()

  /** Per-JVM reader cache: executors referencing the same database path
    * parse the file once (the reference re-opens per process and LRUs
    * lookups; here the reader itself is shared and lock-free).
    */
  def cached(path: String): MmdbReader =
    cache.computeIfAbsent(path, p =>
      new MmdbReader(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))))
}
