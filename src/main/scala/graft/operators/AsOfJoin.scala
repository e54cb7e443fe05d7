package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: every left row picks the single right row
  * with the greatest `rightTs <= leftTs` for the same key — the lookup a
  * log pipeline needs to enrich an event with the dimension state that
  * was current WHEN THE EVENT HAPPENED (slowly-changing user profile,
  * config version, deploy tag), which an equi-join cannot express.
  *
  * Spark-first shape: tag both inputs, union, and run ONE
  * `last(_, ignoreNulls)` window per key ordered by `(ts, side)` — a
  * single shuffle on the key, state = one carried struct per row. The
  * naive spelling (candidate equi-join on key with `rightTs <= leftTs`,
  * then per-left-row max) shuffles fact × matching-dim CANDIDATE PAIRS —
  * at 10¹² events × thousands of versions per key that is a second,
  * quadratically larger shuffle plus a second aggregation; this never
  * materialises a candidate pair. Catalyst sees a plain window over a
  * union of two scans, so AQE still handles key skew, and per-key state
  * during evaluation is O(1) (the running struct), not O(versions).
  *
  * Tie rule: a right row at exactly `leftTs` MATCHES (inclusive, the
  * DuckDB/pandas `merge_asof` convention) — the right side sorts before
  * the left at equal timestamps via the side tag.
  */
object AsOfJoin {

  /** Join `left` to the latest `right` row per `key` with
    * `right.tsCol <= left.tsCol`. Right columns other than the key and
    * timestamp are appended (null when no right row precedes the left
    * row); name collisions must be resolved by the caller beforehand.
    *
    * `tolerance`: optional maximum lookback (e.g. "7 days") — a match
    * older than `leftTs - tolerance` is discarded (the merge_asof
    * knob that stops a years-stale profile from enriching today's
    * event).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      tolerance: Option[String] = None): DataFrame = {
    val rightPayload = right.columns.filter(c => c != key && c != tsCol)
    require(rightPayload.nonEmpty, "right side carries no payload columns")
    val collisions = rightPayload.toSet.intersect(
      left.columns.filterNot(c => c == key || c == tsCol).toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left: ${collisions.mkString(", ")}")

    val leftPayload = left.columns.filter(c => c != key && c != tsCol)
    // one relation, two roles: _side 0 rows carry the dim payload (and
    // their own ts inside the struct, for the tolerance check), _side 1
    // rows carry the fact payload
    val tagged = right.select(
        col(key), col(tsCol), lit(0).as("_side"),
        lit(null).cast(structType(left, leftPayload)).as("_l"),
        struct(col(tsCol).as("_rts") +: rightPayload.map(col): _*).as("_r"))
      .unionByName(left.select(
        col(key), col(tsCol), lit(1).as("_side"),
        struct(leftPayload.map(col): _*).as("_l"),
        lit(null).cast(structType(right, rightPayload, extraTs = tsCol)).as("_r")))

    // `_r` as the final sort key makes the pick among right rows tied on
    // (key, ts) DETERMINISTIC (struct ordering is lexicographic by
    // field): without it, `last` would return whichever duplicate the
    // task ordering happened to sort last — a partitioning-dependent
    // result, which this repo's bit-for-bit contract forbids. Fully
    // identical duplicate rows remain interchangeable (same payload).
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol).asc, col("_side").asc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(col("_r"), ignoreNulls = true).over(w)
    val inWindow: Column = tolerance match {
      case Some(t) => col("_m._rts") >= col(tsCol) - expr(s"INTERVAL $t")
      case None => lit(true)
    }
    tagged
      .withColumn("_m", carried)
      .filter(col("_side") === 1)
      .select(
        col(key) +: col(tsCol) +:
          leftPayload.map(c => col(s"_l.$c").as(c)) ++:
          rightPayload.map(c =>
            when(col("_m").isNotNull && inWindow, col(s"_m.$c")).as(c)): _*)
  }

  /** The `_r` struct's type: the right payload (plus the right ts in
    * front), built from the source frame so null literals line up with
    * the union's other branch.
    */
  private def structType(df: DataFrame, payload: Seq[String],
      extraTs: String = null): org.apache.spark.sql.types.StructType = {
    val fields = payload.map(c => df.schema(c))
    org.apache.spark.sql.types.StructType(
      if (extraTs == null) fields
      else org.apache.spark.sql.types.StructField("_rts",
        df.schema(extraTs).dataType) +: fields)
  }
}
