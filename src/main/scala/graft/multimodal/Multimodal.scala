package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction /
  * frame-sampling run as partition-batched functions over the binary
  * column (the Scala analog of `mapInPandas` — one iterator per
  * partition, vectorizable batch shape, no per-row UDF dispatch).
  *
  * The actual codec step is STUBBED with a deterministic fake (this
  * container ships no image/audio libraries — marked below); everything
  * Spark-side — schema, partitioning, batch iteration, output shape — is
  * real and tested.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      modality: String, // image | audio | video
      payload: Array[Byte],
      source: String)

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      width: Int, // fake-decoded dimensions
      height: Int,
      n_frames: Int,
      checksum: Long)

  /** ==== STUB ==== deterministic fake decode: real implementations swap
    * this single function for an actual codec (e.g. javax.imageio /
    * ffmpeg bindings); the surrounding batch plumbing is unchanged.
    * The fake derives "dimensions" from payload bytes so tests are exact.
    */
  def fakeDecode(r: MediaRow): MediaFeatures = {
    val n = r.payload.length.toLong
    var checksum = 0xcbf29ce484222325L
    var i = 0
    while (i < r.payload.length) {
      checksum ^= (r.payload(i) & 0xffL); checksum *= 0x100000001b3L; i += 1
    }
    MediaFeatures(r.media_id, r.modality, n,
      width = (n % 640).toInt,
      height = ((n * 7) % 480).toInt,
      n_frames = (n / 1000 + 1).toInt,
      checksum = checksum)
  }

  /** Partition-batched decode: one task per partition iterates its rows —
    * the shape that lets a real codec amortise per-batch init (model
    * load, decoder context) exactly like `mapInPandas`.
    */
  def decodeFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition decoder init would go here (==== STUB ====)
      it.map(fakeDecode)
    }
  }

  /** Frame sampling: every `stride`-th `frameBytes`-sized slice of the
    * payload stands in for a frame (==== STUB ==== for real frame
    * extraction); output explodes to one row per sampled frame.
    */
  def sampleFrames(rows: Dataset[MediaRow], stride: Int,
      frameBytes: Int = 1000): DataFrame = {
    require(frameBytes > 0 && stride > 0, "stride and frameBytes must be positive")
    import rows.sparkSession.implicits._
    rows.flatMap { r =>
      val frames = r.payload.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
      frames.map { case (bytes, i) =>
        (r.media_id, i, bytes.length, bytes.take(8).map("%02x".format(_)).mkString)
      }
    }.toDF("media_id", "frame_idx", "frame_bytes", "frame_prefix")
  }

  /** Resize: re-sample the payload to a target "resolution" — every
    * payload maps to exactly `targetW × targetH` output bytes by
    * nearest-neighbor index sampling (==== STUB ==== standing in for a
    * real pixel resampler; byte `k` of the output is byte
    * `k · n / (W·H)` of the input, the 1-D nearest-neighbor rule).
    * Partition-batched like [[decodeFeatures]] so a real resampler can
    * amortise per-batch init; output schema carries the new dimensions
    * the way a real thumbnail stage would.
    */
  def resize(rows: Dataset[MediaRow], targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    require(targetW.toLong * targetH <= Int.MaxValue,
      s"target ${targetW}x$targetH overflows a byte array length")
    val outLen = targetW * targetH
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition resampler init would go here (==== STUB ====)
      it.map { r =>
        val n = r.payload.length
        val out = new Array[Byte](outLen)
        if (n > 0) {
          var k = 0
          while (k < outLen) {
            out(k) = r.payload((k.toLong * n / outLen).toInt)
            k += 1
          }
        }
        (r.media_id, r.modality, targetW, targetH, out)
      }
    }.toDF("media_id", "modality", "width", "height", "payload")
  }

  /** Build a synthetic media table from the documents table (payload =
    * UTF-8 bytes of the text) — deterministic, no external data.
    */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        // NULL-text documents become empty payloads: every downstream
        // consumer (decode/resize/sampleFrames) dereferences payload,
        // and a null would NPE the task mid-batch
        encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"),
        col("source"))
      .as[MediaRow]
  }
}
