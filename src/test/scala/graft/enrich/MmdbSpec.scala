package graft.enrich

import graft.SparkTestBase
import graft.model.Envelope
import org.apache.spark.sql.functions._

/** Builds a real MaxMind-DB binary from scratch (per the public format
  * spec: search tree + 16-byte separator + data section + metadata) and
  * reads it back through [[MmdbReader]] and the enrich path — the writer
  * and reader are independent implementations of the spec, so agreement
  * validates both.
  */
object MmdbFixture {

  // ---- data-section encoder ----
  private def ctrl(t: Int, size: Int): Array[Byte] = {
    require(size < 29, s"fixture encoder supports sizes < 29, got $size")
    if (t < 8) Array(((t << 5) | size).toByte)
    else Array(size.toByte, (t - 7).toByte) // extended: type bits 000
  }
  def str(s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8"); ctrl(2, b.length) ++ b
  }
  def dbl(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    ctrl(3, 8) ++ (7 to 0 by -1).map(i => ((bits >> (8 * i)) & 0xff).toByte)
  }
  private def beBytes(v: Long): Array[Byte] = {
    if (v == 0) Array.empty
    else {
      var n = 8
      while (n > 1 && (v >>> ((n - 1) * 8)) == 0) n -= 1
      ((n - 1) to 0 by -1).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    }
  }
  def uint16(v: Long): Array[Byte] = { val b = beBytes(v); ctrl(5, b.length) ++ b }
  def uint32(v: Long): Array[Byte] = { val b = beBytes(v); ctrl(6, b.length) ++ b }
  def uint64(v: Long): Array[Byte] = { val b = beBytes(v); ctrl(9, b.length) ++ b }
  def bool(v: Boolean): Array[Byte] = ctrl(14, if (v) 1 else 0)
  def arr(items: Array[Byte]*): Array[Byte] =
    ctrl(11, items.length) ++ items.flatten
  def map(entries: (String, Array[Byte])*): Array[Byte] =
    ctrl(7, entries.length) ++ entries.flatMap { case (k, v) => str(k) ++ v }
  /** size-0 pointer (offset < 2048) into the data section. */
  def pointer(offset: Int): Array[Byte] = {
    require(offset < 2048)
    Array(((1 << 5) | ((offset >> 8) & 0x7)).toByte, (offset & 0xff).toByte)
  }

  /** A GeoIP2-City record AST. */
  def cityRecord(geonameId: Long, city: String, continent: String,
      countryIso: String, country: String, lon: Double, lat: Double,
      postal: String, tz: String, regionIso: String, region: String): Array[Byte] =
    map(
      "city" -> map("geoname_id" -> uint32(geonameId),
        "names" -> map("en" -> str(city))),
      "continent" -> map("names" -> map("en" -> str(continent))),
      "country" -> map("iso_code" -> str(countryIso),
        "names" -> map("en" -> str(country))),
      "location" -> map("latitude" -> dbl(lat), "longitude" -> dbl(lon),
        "time_zone" -> str(tz)),
      "postal" -> map("code" -> str(postal)),
      "subdivisions" -> arr(map("iso_code" -> str(regionIso),
        "names" -> map("en" -> str(region)))))

  /** A country-only record (no city.geoname_id → the reference ignores). */
  def countryOnlyRecord(countryIso: String): Array[Byte] =
    map("country" -> map("iso_code" -> str(countryIso)))

  // ---- search-tree builder (record_size 24, ip_version 4) ----
  private final class Node { var left: AnyRef = _; var right: AnyRef = _ }
  private final case class DataRef(offset: Int)

  /** Serialize networks → a complete .mmdb byte image.
    * @param networks (dotted-quad, prefixLen, index into records)
    * @param records  pre-encoded data-section values; a record may embed
    *                 [[pointer]]s at offsets the caller computes
    */
  def build(networks: Seq[(String, Int, Int)], records: Seq[Array[Byte]]): Array[Byte] = {
    // data section layout: records concatenated in order
    val dataOffsets = records.scanLeft(0)(_ + _.length).init
    val dataSection = records.toArray.flatten

    val root = new Node
    for ((ip, plen, recIdx) <- networks) {
      val addr = ip.split("\\.").map(_.toInt)
      val bits = (addr(0) << 24) | (addr(1) << 16) | (addr(2) << 8) | addr(3)
      var node = root
      for (d <- 0 until plen) {
        val bit = (bits >> (31 - d)) & 1
        val last = d == plen - 1
        if (last) {
          val ref = DataRef(dataOffsets(recIdx))
          if (bit == 0) node.left = ref else node.right = ref
        } else {
          val next = (if (bit == 0) node.left else node.right) match {
            case n: Node => n
            case null =>
              val n = new Node
              if (bit == 0) node.left = n else node.right = n
              n
            case _ => throw new IllegalArgumentException(
              s"fixture networks overlap at $ip/$plen")
          }
          node = next
        }
      }
    }
    // breadth-first numbering (any order works; BFS is conventional)
    val order = scala.collection.mutable.ArrayBuffer.empty[Node]
    val queue = scala.collection.mutable.Queue(root)
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      order += n
      Seq(n.left, n.right).foreach { case c: Node => queue.enqueue(c); case _ => () }
    }
    val index = order.zipWithIndex.toMap
    val nodeCount = order.length

    def recordValue(child: AnyRef): Int = child match {
      case n: Node => index(n)
      case DataRef(off) => nodeCount + 16 + off
      case null => nodeCount // the no-data sentinel
    }
    val tree = new java.io.ByteArrayOutputStream()
    for (n <- order; v <- Seq(recordValue(n.left), recordValue(n.right))) {
      tree.write((v >> 16) & 0xff); tree.write((v >> 8) & 0xff); tree.write(v & 0xff)
    }

    val metadata = map(
      "binary_format_major_version" -> uint16(2),
      "binary_format_minor_version" -> uint16(0),
      "build_epoch" -> uint64(1700000000L),
      "database_type" -> str("GeoIP2-City"),
      "description" -> map("en" -> str("graft test fixture")),
      "ip_version" -> uint16(4),
      "languages" -> arr(str("en")),
      "node_count" -> uint32(nodeCount),
      "record_size" -> uint16(24))

    val out = new java.io.ByteArrayOutputStream()
    out.write(tree.toByteArray)
    out.write(new Array[Byte](16)) // data-section separator
    out.write(dataSection)
    out.write(Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte))
    out.write("MaxMind.com".getBytes("US-ASCII"))
    out.write(metadata)
    out.toByteArray
  }
}

class MmdbSpec extends SparkTestBase {
  import spark.implicits._

  private val london = MmdbFixture.cityRecord(2643743L, "London", "Europe", "GB",
    "United Kingdom", -0.0931, 51.5142, "EC1", "Europe/London", "ENG", "England")
  private val tokyo = MmdbFixture.cityRecord(1850144L, "Tokyo", "Asia", "JP",
    "Japan", 139.69, 35.68, "100-0001", "Asia/Tokyo", "13", "Tokyo")
  private val countryOnly = MmdbFixture.countryOnlyRecord("DE")

  // 81.2.69.0/24 → London, 203.0.113.7/32 → Tokyo, 53.0.0.0/8 → country-only
  private val image = MmdbFixture.build(
    Seq(("81.2.69.0", 24, 0), ("203.0.113.7", 32, 1), ("53.0.0.0", 8, 2)),
    Seq(london, tokyo, countryOnly))

  private val dbPath: String = {
    val p = java.nio.file.Files.createTempFile("graft-fixture", ".mmdb")
    java.nio.file.Files.write(p, image)
    p.toString
  }

  private val reader = new MmdbReader(image)

  test("metadata decodes: node_count, record_size, ip_version, typed scalars") {
    assert(reader.recordSizeBits == 24 && reader.ipVersion == 4)
    assert(reader.metadata.get("database_type") == "GeoIP2-City")
    assert(reader.metadata.get("build_epoch") == java.lang.Long.valueOf(1700000000L))
    assert(reader.nodeCount > 0)
  }

  test("search-tree lookup: prefix hit anywhere in the /24, exact /32, misses") {
    def city(ip: String): Option[String] =
      reader.lookup(ip).map(_.asInstanceOf[java.util.Map[String, Any]])
        .map(m => m.get("city").asInstanceOf[java.util.Map[String, Any]]
          .get("names").asInstanceOf[java.util.Map[String, Any]]
          .get("en").asInstanceOf[String])
    assert(city("81.2.69.142").contains("London")) // anywhere in the /24
    assert(city("81.2.69.0").contains("London"))
    assert(city("203.0.113.7").contains("Tokyo")) // the exact /32
    assert(reader.lookup("203.0.113.8").isEmpty) // one past the /32
    assert(reader.lookup("81.2.70.1").isEmpty) // outside the /24
    assert(reader.lookup("not-an-ip").isEmpty)
    assert(reader.lookup("999.1.1.1").isEmpty)
  }

  test("full record decode: nested maps, doubles, uint32, arrays") {
    val rec = reader.lookup("81.2.69.5").get.asInstanceOf[java.util.Map[String, Any]]
    val loc = rec.get("location").asInstanceOf[java.util.Map[String, Any]]
    assert(loc.get("latitude") == java.lang.Double.valueOf(51.5142))
    assert(loc.get("time_zone") == "Europe/London")
    val subs = rec.get("subdivisions").asInstanceOf[java.util.List[Any]]
    assert(subs.get(0).asInstanceOf[java.util.Map[String, Any]].get("iso_code") == "ENG")
    val cityMap = rec.get("city").asInstanceOf[java.util.Map[String, Any]]
    assert(cityMap.get("geoname_id") == java.lang.Long.valueOf(2643743L))
  }

  test("pointer values decode through to their target") {
    // third record is a bare pointer to the London record at offset 0
    val img = MmdbFixture.build(
      Seq(("81.2.69.0", 24, 0), ("10.0.0.0", 8, 1)),
      Seq(london, MmdbFixture.pointer(0)))
    val r = new MmdbReader(img)
    val viaPtr = r.lookup("10.1.2.3").get.asInstanceOf[java.util.Map[String, Any]]
    assert(viaPtr.get("postal").asInstanceOf[java.util.Map[String, Any]]
      .get("code") == "EC1")
  }

  test("ipv4Networks enumerates every data-bearing prefix") {
    val nets = reader.ipv4Networks().map(_._1).toSet
    assert(nets == Set("81.2.69.0/24", "203.0.113.7/32", "53.0.0.0/8"))
  }

  test("enrichMmdb: hit merges the geo struct; unknown silent; invalid tagged") {
    val df = Seq(
      ("t1", "81.2.69.142"), // in the /24 → London
      ("t2", "8.8.8.8"), // valid, not in db → silent
      ("t3", "53.20.1.2"), // country-only record: geoname_id 0 → ignore
      ("t4", "not.an.ip.addr"), // invalid → failure tag + error field
      ("t5", null) // null field → untouched
    ).toDF("id", "ip")
      .withColumn(Envelope.TagsCol, array())
      .withColumn(Envelope.FieldsCol, map().cast("map<string,string>"))
    val out = GeoIp.enrichMmdb(df, col("ip"), dbPath)
    val rows = out.select(col("id"), col("source.geo.city_name"),
        col("source.geo.location"),
        array_join(col(Envelope.TagsCol), ","),
        element_at(col(Envelope.FieldsCol), "_geoip_error"))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), if (r.isNullAt(2)) null else r.getSeq[Double](2),
          r.getString(3), r.getString(4)))).toMap
    assert(rows("t1")._1 == "London")
    assert(rows("t1")._2 == Seq(-0.0931, 51.5142))
    assert(rows("t1")._3 == "")
    assert(rows("t2")._1 == null && rows("t2")._3 == "")
    assert(rows("t3")._1 == null && rows("t3")._3 == "") // GeoNameID 0 → ignored
    assert(rows("t4")._3 == "_geoip_failure")
    assert(rows("t4")._4 == "Field 'ip' is not a valid IP address")
    assert(rows("t5")._3 == "")
  }

  test("config-driven geoip with a .mmdb database file") {
    val yaml =
      s"""- name: geoip
         |  field: ip
         |  database: $dbPath
         |""".stripMargin
    val df = Seq(("c1", 0, "user", "x", "none", new java.sql.Timestamp(0L)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val stages = graft.pipeline.PipelineConfig.fromYaml(yaml)
    val withIp = graft.pipeline.Pipeline(df,
      graft.pipeline.PipelineConfig.fromJson(
        """[{"set_field": {"field": "ip", "value": "\"203.0.113.7\""}}]""") ++ stages)
    val r = withIp.select(col("source.geo.city_name"), col("source.geo.timezone"))
      .collect()(0)
    assert(r.getString(0) == "Tokyo" && r.getString(1) == "Asia/Tokyo")
  }

  test("corrupt files fail loudly with the contract, not a bare index error") {
    // no metadata marker at all
    val e1 = intercept[IllegalArgumentException](
      new MmdbReader(Array.fill[Byte](64)(0x11)))
    assert(e1.getMessage.contains("metadata marker"))
    // the metadata tail (marker + metadata map), located exactly
    val marker = Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++
      "MaxMind.com".getBytes("US-ASCII")
    val markerIdx = (0 to image.length - marker.length).reverse.find(i =>
      marker.indices.forall(j => image(i + j) == marker(j))).get
    val metaTail = image.drop(markerIdx)
    // declared tree exceeds the pre-metadata region: 8 bytes of tree +
    // the intact metadata (node_count unchanged) → construction refuses
    val e2 = intercept[IllegalArgumentException](
      new MmdbReader(java.util.Arrays.copyOfRange(image, 0, 8) ++ metaTail))
    assert(e2.getMessage.contains("corrupt MaxMind-DB"))
    // a tree record pointing far past the file (the truncated-data
    // shape): the lookup must fail with the contract message, not a
    // bare index error from inside a per-row expression
    val patched = image.clone()
    patched(0) = 0x7f.toByte; patched(1) = 0xff.toByte; patched(2) = 0xff.toByte
    val rd = new MmdbReader(patched)
    // 81.x.x.x starts with bit 0 → walks node 0's (patched) left record
    val thrown = intercept[IllegalArgumentException](rd.lookup("81.2.69.1"))
    assert(thrown.getMessage.contains("corrupt MaxMind-DB"))
  }

  test("IPv6 literal parse path (colon form) is accepted by the validity check") {
    assert(MmdbCityLookup.parsesAsIp("2001:db8::1"))
    assert(MmdbCityLookup.parsesAsIp("::ffff:81.2.69.1"))
    assert(!MmdbCityLookup.parsesAsIp("example.com"))
    assert(!MmdbCityLookup.parsesAsIp("81.2.69"))
    // v6 address against a v4-only tree: valid IP, no record, no error
    assert(reader.lookup("2001:db8::1").isEmpty)
  }
}
