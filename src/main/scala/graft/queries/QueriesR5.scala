package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Round-5 driver queries. */
object QueriesR5 {

  // ---------------------------------------------------------------
  // Multimodal resize + frame sampling, oracle-checked (round-4 additions
  // were ScalaTest-only; VERDICT r4 #8): per media row, the nearest-
  // neighbor resize output is hashed (md5 of the full resized payload —
  // the oracle reconstructs every byte via the same 1-D rule
  // out[k] = in[k·n/outLen] and hashes the identical blob) and the
  // stride-sampled frame lattice is aggregated (count / byte total /
  // frame-0 prefix). The codec itself stays the disclosed deterministic
  // stub; what this locks down cross-engine is the Spark-side plumbing:
  // payload bytes, sampling indices, chunk boundaries, resize index math.
  // ---------------------------------------------------------------
  val ResizeW = 16
  val ResizeH = 16
  val FrameStride = 2
  val FrameBytes = 100 // shipped docs are <600 bytes; 100-byte frames make
                       // the chunk lattice real (≈6 frames/doc, 3 sampled)
  def qMultimodalResize(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.fromDocuments(spark, dir)
    val rz = Multimodal.resize(media, ResizeW, ResizeH)
      .select(col("media_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        // md5 over the LOWERCASE-HEX encoding of the resized payload —
        // DuckDB has no BLOB substring, so the oracle reconstructs the
        // bytes as a hex string; hashing the same encoding both sides
        // keeps the comparison byte-exact without unhex/BLOB support
        md5(lower(hex(col("payload")))).as("resize_md5"))
    val fr = Multimodal.sampleFrames(media, FrameStride, FrameBytes)
      .groupBy("media_id").agg(
        count(lit(1)).as("n_sampled"),
        sum(col("frame_bytes")).cast("long").as("sampled_bytes"),
        min(when(col("frame_idx") === 0, col("frame_prefix"))).as("frame0_prefix"))
    rz.join(fr, Seq("media_id"), "left").orderBy("media_id")
  }
  val qMultimodalResizeSql: String = {
    val outLen = ResizeW * ResizeH
    s"""WITH media AS (
       |  SELECT doc_id AS media_id, lower(hex(encode(text))) AS hx,
       |         octet_length(encode(text)) AS n
       |  FROM documents),
       |rz AS (
       |  SELECT media_id, CAST($ResizeW AS BIGINT) AS width,
       |    CAST($ResizeH AS BIGINT) AS height,
       |    md5(string_agg(
       |      CASE WHEN n = 0 THEN '00'
       |           ELSE substr(hx, CAST((k * n) // $outLen AS BIGINT) * 2 + 1, 2) END,
       |      '' ORDER BY k)) AS resize_md5
       |  FROM media CROSS JOIN range($outLen) t(k)
       |  GROUP BY media_id, n),
       |frames AS (
       |  SELECT media_id, CAST(i AS INTEGER) AS frame_idx,
       |    CAST(least($FrameBytes, n - i * $FrameBytes) AS INTEGER) AS frame_bytes,
       |    substr(hx, CAST(i * $FrameBytes AS BIGINT) * 2 + 1, 16) AS frame_prefix
       |  FROM media CROSS JOIN range(256) t(i)
       |  WHERE i < (n + $FrameBytes - 1) // $FrameBytes
       |    AND i % $FrameStride = 0),
       |fagg AS (
       |  SELECT media_id, count(*) AS n_sampled,
       |    CAST(sum(frame_bytes) AS BIGINT) AS sampled_bytes,
       |    min(CASE WHEN frame_idx = 0 THEN frame_prefix END) AS frame0_prefix
       |  FROM frames GROUP BY media_id)
       |SELECT rz.media_id AS media_id, width, height, resize_md5,
       |       n_sampled, sampled_bytes, frame0_prefix
       |FROM rz LEFT JOIN fagg ON rz.media_id = fagg.media_id
       |ORDER BY rz.media_id""".stripMargin
  }
}
