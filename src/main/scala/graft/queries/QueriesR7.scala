package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Round-7 driver queries. */
object QueriesR7 {

  /** REAL image decode, driver-verified: `Multimodal.imageTable`
    * synthesises a grayscale PNG per document whose pixels are pure
    * arithmetic in `doc_id` (`(31·id + y·W + x) mod 256`, `W = 16 +
    * id%8`, `H = 12 + id%5`), `resizeDecoded` decodes with
    * `javax.imageio` and nearest-neighbor-resamples to 8×6, and the
    * output row carries the decoder-reported codec + source dimensions
    * plus a position-weighted pixel sum of the thumbnail. The oracle
    * recomputes every resized pixel arithmetically — PNG is lossless, so
    * any decoder deviation (wrong pixels, wrong dims, fallback to the
    * stub) breaks the hash.
    */
  def qMultimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.resizeDecoded(Multimodal.imageTable(spark, dir), 8, 6)
      .select("media_id", "codec", "src_w", "src_h", "payload")
      .as[(Long, String, Int, Int, Array[Byte])]
      .map { case (id, codec, w, h, p) =>
        var s = 0L
        var k = 0
        while (k < p.length) { s += (p(k) & 0xff).toLong * (k + 1); k += 1 }
        (id, codec, w.toLong, h.toLong, s)
      }
      .toDF("media_id", "codec", "src_w", "src_h", "pix_sum")
      .orderBy("media_id")
  }

  /** The arithmetic replay: resized pixel k (x = k mod 8, y = k div 8)
    * reads source pixel (x·W div 8, y·H div 6) of the generated image.
    */
  val qMultimodalDecodeSql: String =
    """WITH px AS (
      |  SELECT doc_id, k,
      |    (31 * doc_id
      |      + ((k // 8) * (12 + doc_id % 5) // 6) * (16 + doc_id % 8)
      |      + ((k % 8) * (16 + doc_id % 8) // 8)) % 256 AS v
      |  FROM documents, unnest(range(0, 48)) AS t(k)
      |)
      |SELECT doc_id AS media_id, 'imageio:png' AS codec,
      |  CAST(16 + doc_id % 8 AS BIGINT) AS src_w,
      |  CAST(12 + doc_id % 5 AS BIGINT) AS src_h,
      |  CAST(SUM(v * (k + 1)) AS BIGINT) AS pix_sum
      |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin
}
