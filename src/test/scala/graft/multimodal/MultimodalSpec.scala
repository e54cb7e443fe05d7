package graft.multimodal

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("partition-batched decode equals the per-row stub applied locally") {
    val rows = Multimodal.fromDocuments(spark, dir)
    val local = rows.collect().map(Multimodal.fakeDecode)
      .map(f => f.media_id -> f).toMap
    val dist = Multimodal.decodeFeatures(rows).collect()
      .map(f => f.media_id -> f).toMap
    assert(dist == local)
    assert(dist.nonEmpty)
    // schema invariants a real decoder must respect
    dist.values.foreach { f =>
      assert(f.width >= 0 && f.width < 640)
      assert(f.height >= 0 && f.height < 480)
      assert(f.n_frames >= 1)
    }
  }

  test("resize: every payload maps to exactly W*H bytes, nearest-neighbor") {
    val rows = Multimodal.fromDocuments(spark, dir)
    val resized = Multimodal.resize(rows, targetW = 8, targetH = 4).collect()
    val src = rows.collect().map(r => r.media_id -> r.payload).toMap
    assert(resized.length == src.size)
    resized.foreach { row =>
      val id = row.getLong(0)
      val out = row.getAs[Array[Byte]]("payload")
      assert(row.getInt(2) == 8 && row.getInt(3) == 4)
      assert(out.length == 32)
      val in = src(id)
      // 1-D nearest-neighbor: out(k) == in(k*n/32)
      (0 until 32).foreach { k =>
        assert(out(k) == in((k.toLong * in.length / 32).toInt), s"media $id byte $k")
      }
    }
  }

  test("frame sampling: stride selects every nth kilobyte slice") {
    val rows = Multimodal.fromDocuments(spark, dir)
    val frames = Multimodal.sampleFrames(rows, stride = 2).collect()
    val byId = frames.groupBy(_.getLong(0))
    val sizes = rows.collect().map(r => r.media_id -> r.payload.length).toMap
    for ((id, fs) <- byId) {
      val nSlices = (sizes(id) + 999) / 1000
      val expected = (0 until nSlices).count(_ % 2 == 0)
      assert(fs.length == expected, s"media $id")
      assert(fs.forall(_.getInt(1) % 2 == 0))
    }
  }
}
