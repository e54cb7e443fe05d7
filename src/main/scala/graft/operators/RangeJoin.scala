package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: match each point row to every
  * interval row of the same key whose `[start, end)` contains the
  * point — alert windows, deploy windows, promo periods, session
  * spans. Plain Spark spells this as an equi-join on the key with a
  * range predicate — which the planner can only execute as the key
  * equi-join followed by a per-key-group filter, fine until one key's
  * point×interval product explodes, or (with no key) as a
  * BroadcastNestedLoopJoin over the whole corpus.
  *
  * Spark-first shape: quantize time into `bucket`-wide chunks, explode
  * each interval into the chunks it covers, and equi-join on
  * `(key, chunk)` before refining with the exact range predicate. The
  * join is a plain hash/sort-merge equi-join (shuffle bounded by
  * points + interval-chunks, AQE-skew-splittable); a point lives in
  * exactly ONE chunk, so no pair is produced twice and no dedup pass
  * exists. Chunk width trades replication for selectivity: intervals
  * replicate `len/bucket + 1` times — choose bucket ≈ the typical
  * interval length, and the guard below makes a mis-sized bucket a
  * loud error instead of a silent 10⁶-row blow-up per interval.
  */
object RangeJoin {

  /** `points` joined to `intervals` on equal `key` and
    * `startCol <= tsCol < endCol` (half-open, the convention that makes
    * adjacent windows partition time). Timestamps are compared on
    * epoch seconds; `bucketSeconds` is the chunk width and
    * `maxChunksPerInterval` (default 4096) bounds the replication of a
    * single interval — an interval longer than
    * `bucket × maxChunks` fails loudly with the offending length.
    * Column name collisions between the two sides must be resolved by
    * the caller.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
      tsCol: String, startCol: String, endCol: String, bucketSeconds: Long,
      maxChunksPerInterval: Int = 4096): DataFrame = {
    require(bucketSeconds > 0, "bucket width must be positive")
    val collisions = intervals.columns.toSet.intersect(points.columns.toSet) - key
    require(collisions.isEmpty,
      s"interval columns collide with point columns: ${collisions.mkString(", ")}")

    // all arithmetic in MICROSECONDS — parquet timestamps carry micro
    // precision, and a second-truncated compare silently changes
    // sub-second boundary semantics (a point 0.1 s before an interval's
    // fractional end must match; one 0.1 s after a fractional start
    // must not) and can even skip the boundary chunk in the coverage
    // explode. Caught by a one-row diff against the naive join at 1.6M
    // events; pinned in RangeJoinSpec's sub-second cases.
    val bucketUs = bucketSeconds * 1000000L
    val pts = points.withColumn("_epoch",
        unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("_chunk", expr(s"_epoch div ${bucketUs}L"))
      .drop("_epoch")
    val iv = intervals
      .withColumn("_s", unix_micros(col(startCol).cast("timestamp")))
      .withColumn("_e", unix_micros(col(endCol).cast("timestamp")))
    val guarded = iv.withColumn("_nchunks",
      expr(s"(_e - 1) div ${bucketUs}L") - expr(s"_s div ${bucketUs}L") + 1)
    // loud failure on a mis-sized bucket: assert inside the plan so the
    // job dies with the offending interval length, not an OOM later
    val expanded = guarded
      .withColumn("_guard",
        when(col("_e") <= col("_s"), lit(null).cast("long")) // empty: no chunks
          .when(col("_nchunks") > maxChunksPerInterval,
            raise_error(concat(lit(s"range join: interval spans more than " +
              s"$maxChunksPerInterval chunks of $bucketSeconds s — "),
              col("_nchunks"), lit(" chunks; widen bucketSeconds"))).cast("long"))
          .otherwise(col("_nchunks")))
      .filter(col("_guard").isNotNull)
      .withColumn("_chunk",
        explode(sequence(expr(s"_s div ${bucketUs}L"),
          expr(s"(_e - 1) div ${bucketUs}L"))))
    pts.join(expanded, Seq(key, "_chunk"))
      .filter(unix_micros(col(tsCol).cast("timestamp")) >= col("_s") &&
        unix_micros(col(tsCol).cast("timestamp")) < col("_e"))
      .drop("_chunk", "_s", "_e", "_nchunks", "_guard")
  }
}
