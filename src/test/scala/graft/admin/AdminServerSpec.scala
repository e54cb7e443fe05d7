package graft.admin

import org.scalatest.funsuite.AnyFunSuite

/** Navigable admin REST tree (`lc-lib/admin/server.go`, `apiroot.go`):
  * leaf GET returns JSON, interior GET lists children, unknown paths 404,
  * and a live metric registered as a provider reflects updates without
  * re-registration — the polling surface `lc-admin` connects to.
  */
class AdminServerSpec extends AnyFunSuite {

  private def get(addr: java.net.InetSocketAddress, path: String): (Int, String) = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"http://127.0.0.1:${addr.getPort}$path"))
      .GET().build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("root lists entries; name/version leaves encode like apiroot.go:40-53") {
    val srv = new AdminServer(name = "graft", version = "3")
    val meter = new java.util.concurrent.atomic.AtomicLong(0L)
    srv.register("pipeline/speed", () => Map("lines_per_sec" -> meter.get()))
    srv.register("pipeline/sinks", () => Seq("sink_main", "sink_tools"))
    val addr = srv.start()
    try {
      val (c0, root) = get(addr, "/")
      assert(c0 == 200 && root.contains("\"name\"") && root.contains("\"pipeline\""))
      assert(get(addr, "/name") == ((200, "\"graft\"")))
      assert(get(addr, "/version") == ((200, "\"3\"")))
      // interior node: sorted child listing
      assert(get(addr, "/pipeline") == ((200, """["sinks","speed"]""")))
      // live provider: polled value reflects updates (the lc-admin loop)
      meter.set(12345L)
      val (c1, b1) = get(addr, "/pipeline/speed")
      assert(c1 == 200 && b1 == """{"lines_per_sec":12345}""")
      meter.set(777L)
      assert(get(addr, "/pipeline/speed")._2 == """{"lines_per_sec":777}""")
      // unknown path → 404 (server.go:225-235)
      assert(get(addr, "/nope")._1 == 404)
    } finally srv.stop()
  }

  test("forSpark wires live streaming speed meters into the tree (lc-admin poll loop)") {
    val spark = graft.SparkTestBase.spark
    val speeds = graft.streaming.StreamingPipeline.attachSpeedListener(spark)
    val srv = AdminServer.forSpark(spark, speeds)
    val addr = srv.start()
    val q = spark.readStream.format("rate").option("rowsPerSecond", "500").load()
      .writeStream.format("memory").queryName("admin_rate_probe").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var speed = 0.0
      while (speed <= 0.0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(300)
        val (c, body) = get(addr, "/pipeline/speed")
        assert(c == 200)
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
        if (node.has("admin_rate_probe")) speed = node.get("admin_rate_probe").asDouble()
      }
      assert(speed > 0.0, "live meter must surface rows/sec through the admin endpoint")
      val (_, names) = get(addr, "/pipeline/queries")
      assert(names.contains("admin_rate_probe"))
    } finally { q.stop(); srv.stop() }
  }

  test("forBatch exposes per-sink counters and lineage progress (publisher/api.go:33-36 analog)") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("admin_batch").toString
    val df = Seq(
      ("c1", "hello", "sink_main"), ("c1", "world!", "sink_main"),
      ("c2", "err", "sink_errors")
    ).toDF("conv_id", "text", graft.route.Router.SinkCol)
    val srv = AdminServer.forBatch(spark, root, "b1", 4, () => Map("p" -> 1))
    val addr = srv.start()
    try {
      // before any bucket commits: empty counters, zero progress
      val (c0, empty) = get(addr, "/pipeline/sinks")
      assert(c0 == 200 && empty == "{}")
      assert(get(addr, "/pipeline/lineage")._2.contains("\"buckets_committed\":0"))
      graft.lineage.Lineage.run(df, root, nBuckets = 4, batchId = "b1")
      // after commit: live counts over the sealed buckets
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(get(addr, "/pipeline/sinks")._2)
      assert(node.get("sink_main").get("turns").asLong == 2L)
      assert(node.get("sink_main").get("bytes").asLong == 11L) // "hello"+"world!"
      assert(node.get("sink_errors").get("turns").asLong == 1L)
      val lin = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(get(addr, "/pipeline/lineage")._2)
      assert(lin.get("buckets_committed").asInt > 0 && lin.get("buckets_total").asInt == 4)
      assert(get(addr, "/pipeline")._2.contains("\"sinks\""))
    } finally srv.stop()
  }

  test("respond() unit surface: empty tree path vs leaf precedence") {
    val srv = new AdminServer()
    srv.register("a/b/c", () => 1)
    assert(srv.respond("a")._2 == """["b"]""")
    assert(srv.respond("a/b")._2 == """["c"]""")
    assert(srv.respond("a/b/c") == ((200, "1")))
  }
}
