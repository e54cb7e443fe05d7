package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkTestBase {

  test("stdin source: one event per line, running byte offsets, '-' path (stdinharvester.go:20-44)") {
    val in = new java.io.ByteArrayInputStream("first\nsecond line\nthird\n".getBytes("UTF-8"))
    val df = Sources.stdin(spark, in, parallelism = 2)
    val rows = df.orderBy("offset").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      ("first", 6L, "-"),          // "first\n" = 6 bytes
      ("second line", 18L, "-"),
      ("third", 24L, "-")))
  }

  test("stdin source feeds the normal pipeline (kv parse end-to-end)") {
    val in = new java.io.ByteArrayInputStream("a=1 b=2\nc=3\n".getBytes("UTF-8"))
    val df = Sources.stdin(spark, in, parallelism = 2)
    val parsed = df.select(element_at(graft.functions.KvParse(col("text")), "a").as("a"))
    assert(parsed.collect().map(_.getString(0)).toSet == Set("1", null))
  }

  test("stdin spools in bounded chunks: input much larger than one batch, exact offsets, bounded driver memory") {
    val nLines = 5000
    val data = (1 to nLines).map(i => s"line-$i").mkString("", "\n", "\n")
    val in = new java.io.ByteArrayInputStream(data.getBytes("UTF-8"))
    val spoolDir = java.nio.file.Files.createTempDirectory("stdin_chunks").toString
    // batchLines = 512: the driver only ever holds 512 lines — the
    // unbounded-pipe shape (stdinharvester.go reads forever)
    val chunks = Sources.spoolStdin(spark, in, spoolDir, batchLines = 512, parallelism = 2)
    assert(chunks == 10, s"ceil(5000/512) chunk appends, got $chunks")
    val df = spark.read.parquet(spoolDir)
    assert(df.count() == nLines)
    assert(df.agg(max("offset")).collect()(0).getLong(0) ==
      data.getBytes("UTF-8").length, "final offset = total stream bytes")
    assert(df.orderBy("offset").limit(3).collect().map(_.getString(0)).toSeq ==
      Seq("line-1", "line-2", "line-3"))
    assert(df.select("path").distinct().collect().map(_.getString(0)).toSeq == Seq("-"))
  }

  test("stdin: final unterminated line records its true end offset; CRLF counted but stripped") {
    // "a\nbb" — the stream ends mid-line: the registrar-exact offset for
    // "bb" is 4 (no phantom newline), where the pre-round-4 code said 5
    val in = new java.io.ByteArrayInputStream("a\nbb".getBytes("UTF-8"))
    val rows = Sources.stdin(spark, in, parallelism = 2)
      .orderBy("offset").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("a", 2L), ("bb", 4L)))
    // CRLF: '\r' consumed (offset counts it) but stripped from text
    val in2 = new java.io.ByteArrayInputStream("x\r\ny\n".getBytes("UTF-8"))
    val rows2 = Sources.stdin(spark, in2, parallelism = 2)
      .orderBy("offset").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows2.toSeq == Seq(("x", 3L), ("y", 5L)))
  }

  test("stdin temp spools are tracked and swept (delete-on-exit hygiene)") {
    val in = new java.io.ByteArrayInputStream("only line\n".getBytes("UTF-8"))
    val df = Sources.stdin(spark, in, parallelism = 2)
    val spoolDir = df.inputFiles.head.replaceFirst("^file:", "").replaceFirst("/[^/]+$", "")
    assert(spoolDir.contains("graft_stdin_spool"))
    assert(df.count() == 1) // consume before sweeping
    Sources.cleanupSpools() // the JVM-exit hook runs this same sweep
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(spoolDir)),
      s"spool $spoolDir must be deleted by the sweep")
  }

  test("socket stream carries _meta_receiver connection metadata and sinks strip it (metadata_receiver.go:22-32)") {
    val server = new java.net.ServerSocket(0)
    try {
      val df = Sources.socketStream(spark, "localhost", server.getLocalPort)
      assert(df.columns.contains("_meta_receiver"))
      val recv = df.schema("_meta_receiver").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(recv.fieldNames.toSeq == Seq("remote_host", "remote_port", "protocol"))
      // every sink goes through stripMeta — receiver metadata never ships,
      // like the reference strips @metadata on serialisation
      val stripped = graft.route.Router.stripMeta(df)
      assert(!stripped.columns.contains("_meta_receiver"))
      assert(stripped.columns.contains("text"))
    } finally server.close()
  }

  test("socket stream receiver: newline-delimited TCP text, one event per line, no acks (stream/protocol.go:58-77)") {
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    val writer = new Thread(() => {
      val sock = server.accept()
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      for (i <- 1 to 5) out.println(s"line $i")
      out.flush()
      Thread.sleep(3000) // keep the connection open while the stream polls
      sock.close(); server.close()
    })
    writer.setDaemon(true)
    writer.start()
    val df = Sources.socketStream(spark, "localhost", port)
    assert(df.isStreaming)
    val q = df.writeStream.format("memory").queryName("sock_test")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(200))
      .start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n < 5 && System.currentTimeMillis() < deadline) {
        Thread.sleep(300)
        n = spark.sql("SELECT count(*) FROM sock_test").collect()(0).getLong(0)
      }
      assert(n == 5, s"expected 5 streamed lines, saw $n")
      val texts = spark.sql("SELECT text FROM sock_test").collect().map(_.getString(0)).toSet
      assert(texts == (1 to 5).map(i => s"line $i").toSet)
    } finally q.stop()
  }

  test("spoolStdin caps newline-free input into rune-safe chunks (no unbounded line buffer)") {
    // 10 KB with no newline, multi-byte runes throughout, tiny cap: the
    // driver buffer must stay O(cap) and chunks must decode cleanly
    val rune = "abc\u65e5" // 3 ASCII + 3-byte CJK = 6 bytes
    val payload = rune * 1700 // ~10.2 KB, no newline anywhere
    val in = new java.io.ByteArrayInputStream(payload.getBytes("UTF-8"))
    val spoolDir = java.nio.file.Files.createTempDirectory("graft-longline").toString + "/spool"
    Sources.spoolStdin(spark, in, spoolDir, batchLines = 64, parallelism = 2,
      maxLineBytes = 1024)
    val rows = spark.read.parquet(spoolDir)
      .orderBy("offset").collect()
    val texts = rows.map(_.getAs[String]("text"))
    assert(texts.length >= 9, s"10 KB at a 1 KB cap must split, got ${texts.length} rows")
    assert(texts.forall(t => t.getBytes("UTF-8").length <= 1024 + 3),
      "chunks must respect the cap (+3-byte rune overhang)")
    assert(!texts.exists(_.contains("\ufffd")), "splits must land on rune boundaries")
    assert(texts.mkString == payload, "chunks must reassemble the exact input")
    // registrar math: the last offset equals total consumed bytes
    assert(rows.map(_.getAs[Long]("offset")).max == payload.getBytes("UTF-8").length)
  }

  test("spoolStdin: newline-free PURE-continuation-byte stream still splits (binary piped to stdin)") {
    // 8 KB of 0x80 bytes: no byte is ever a UTF-8 lead byte, so a split
    // condition keyed on lead bytes alone never fires and the driver line
    // buffer grows without bound — the hard stop at cap+3 must cut it
    val payload = Array.fill[Byte](8192)(0x80.toByte)
    val in = new java.io.ByteArrayInputStream(payload)
    val spoolDir = java.nio.file.Files.createTempDirectory("graft-binline").toString + "/spool"
    Sources.spoolStdin(spark, in, spoolDir, batchLines = 64, parallelism = 2,
      maxLineBytes = 512)
    val rows = spark.read.parquet(spoolDir).orderBy("offset").collect()
    // chunks of exactly cap+3 bytes (515), last one the 467-byte remainder
    assert(rows.length == 16, s"8192 B at a 512 B cap must make 16 chunks, got ${rows.length}")
    // each invalid byte decodes to one replacement char: chunk length in
    // chars equals its byte length, so the buffer provably stayed O(cap)
    assert(rows.map(_.getAs[String]("text").length).max <= 512 + 3)
    assert(rows.map(_.getAs[Long]("offset")).max == 8192L)
  }
}
