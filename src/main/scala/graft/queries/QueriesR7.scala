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

  /** As-of (point-in-time) join, driver-verified: every event is
    * enriched with the user's latest PRECEDING signup event — the
    * dimension state that was current when the event happened, a lookup
    * an equi-join cannot express. The engine runs the union + one-window
    * shape ([[graft.operators.AsOfJoin]] — a single shuffle, no
    * candidate pairs); the oracle is DuckDB's native ASOF LEFT JOIN, an
    * independently-implemented point-in-time semantics — agreement
    * pins the inclusive tie rule and the no-preceding-match NULLs.
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val dims = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"),
        col("event_id").as("signup_id"), col("value").as("signup_value"))
    graft.operators.AsOfJoin.asOf(
        ev.select("event_id", "user_id", "ts", "event_type"), dims,
        key = "user_id", tsCol = "ts")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("signup_id"), col("signup_value"))
      .orderBy("event_id")
  }

  val qAsofJoinSql: String =
    """SELECT e.event_id, e.user_id, e.event_type,
      |  d.event_id AS signup_id, d.value AS signup_value
      |FROM events e ASOF LEFT JOIN
      |  (SELECT user_id, ts, event_id, value FROM events
      |   WHERE event_type = 'signup') d
      |  ON e.user_id = d.user_id AND e.ts >= d.ts
      |ORDER BY e.event_id""".stripMargin

  /** Count-Min heavy hitters, driver-verified: one corpus scan folds
    * every ASCII word into the 4×1024 sketch
    * ([[graft.sketch.CountMin]] — constant state per partition, d·w-long
    * shuffle), the collected lattice rides the estimate expression as
    * plan state, and the output ranks the top-40 true terms with BOTH
    * the exact count and the sketch estimate. The oracle re-derives the
    * identical lattice in SQL (the hash family is integer mod-P
    * arithmetic by design), so every estimate — collisions included —
    * must match bit-for-bit, and `n_est >= n_true` (the CMS one-sided
    * error) is visible in the output. The exact-count side is the
    * verification harness; at 100 TB the sketch alone answers
    * frequency queries without the per-term shuffle.
    */
  def qCmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val D = 4; val W = 1024
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val words = docs
      .select(explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$")) // ASCII-only: byte fold == codepoint fold
    // bounded collect: the sketch is d·w = 4096 longs BY CONSTRUCTION
    val sk = words.agg(graft.sketch.CountMin.sketch(col("w"), D, W))
      .head.getSeq[Long](0).toArray
    val counts = words.groupBy("w").agg(count(lit(1)).as("n_true"))
    val wnd = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_true").desc, col("w"))
    counts.withColumn("rank", row_number().over(wnd))
      .filter(col("rank") <= 40)
      .select(col("rank"), col("w").as("term"), col("n_true"),
        graft.sketch.CountMin.estimate(col("w"), sk, D, W).as("n_est"))
      .orderBy("rank")
  }

  val qCmsHeavyHittersSql: String =
    """WITH words AS (
      |  SELECT unnest(string_split(coalesce(text, ''), ' ')) AS w FROM documents),
      |terms AS (
      |  SELECT w, count(*) AS n_true FROM words
      |  WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w),
      |hashed AS (
      |  SELECT w, n_true,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, len(w) + 1),
      |        i -> CAST(unicode(w[CAST(i AS INT)]) AS BIGINT))),
      |      (acc, c) -> (acc * 31 + c) % 1000000007) AS h
      |  FROM terms),
      |lattice AS (
      |  SELECT i.i AS row_i,
      |    ((h * (131 * i.i + 17) + (977 * i.i + 3)) % 1000000007) % 1024 AS col_b,
      |    CAST(SUM(n_true) AS BIGINT) AS cnt
      |  FROM hashed CROSS JOIN range(4) i(i)
      |  GROUP BY 1, 2),
      |est AS (
      |  SELECT t.w, t.n_true, CAST(MIN(l.cnt) AS BIGINT) AS n_est
      |  FROM hashed t CROSS JOIN range(4) i(i)
      |  JOIN lattice l ON l.row_i = i.i AND l.col_b =
      |    ((t.h * (131 * i.i + 17) + (977 * i.i + 3)) % 1000000007) % 1024
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT *, row_number() OVER (ORDER BY n_true DESC, w) AS rank FROM est)
      |SELECT rank, w AS term, CAST(n_true AS BIGINT) AS n_true, n_est
      |FROM ranked WHERE rank <= 40 ORDER BY rank""".stripMargin

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
