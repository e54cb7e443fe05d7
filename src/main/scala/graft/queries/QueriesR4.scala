package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Facts

/** Round-4 driver queries. */
object QueriesR4 {

  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // ---------------------------------------------------------------
  // fact-courier analog (munin.go / munintype.go): events shaped into
  // periodic metric samples — plugin = event_type, two fields per
  // plugin, DST type a deterministic function of (plugin, field) so all
  // three munin types (GAUGE/COUNTER/DERIVE, including the counter-wrap
  // branch: values decrease freely in this data) are exercised — then
  // Facts.factEvents computes each field's real value and the
  // metricsets envelope. The oracle recomputes the whole lattice
  // (boundary truncation, per-series lag window, DST arithmetic,
  // requires-previous drop, envelope) in SQL; the facts map is exploded
  // to rows so every calculated value is hash-compared. Values ship as
  // e4-scaled BIGINTs (round(x*10⁴)) rather than round(x,4) doubles:
  // rates like Δ/300 are decimal-half-way at 4 digits by construction,
  // and the two engines' round(,4) implementations resolve the tie from
  // different representations (Spark from the shortest-digits decimal,
  // DuckDB from the multiplied double) — multiplying first makes both
  // engines round the SAME double, so the tie resolves identically.
  // ---------------------------------------------------------------
  def qFacts(spark: SparkSession, dir: String): DataFrame = {
    val ev = tbl(spark, dir, "events")
    val dstIdx = (length(col("plugin")) + col("fidx")) % 3
    val samples = ev
      .select(
        Facts.collectionBoundary(col("ts"), 300).as("ts"),
        col("event_type").as("plugin"),
        (col("user_id") % 2).as("fidx"),
        col("value"))
      .withColumn("field", concat(lit("m"), col("fidx").cast("string")))
      .withColumn("dst",
        when(dstIdx === 0, "GAUGE").when(dstIdx === 1, "COUNTER").otherwise("DERIVE"))
      // one sample per (plugin, field, collection) — the munin runner
      // contract; last-wins within a boundary is modelled as max()
      .groupBy("ts", "plugin", "field", "dst").agg(max("value").as("value"))
    Facts.factEvents(samples)
      .select(col("ts"), col("type"), col("dataset"),
        col("metricset_module"), col("metricset_name"), explode(col("facts")))
      .select(col("ts"), col("type"), col("dataset"),
        col("metricset_module"), col("metricset_name"),
        col("key").as("field"),
        round(col("value") * lit(10000.0)).cast("long").as("value_e4"))
      .orderBy("ts", "dataset", "field")
  }
  val qFactsSql: String =
    """WITH samples AS (
      |  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS ts,
      |         event_type AS plugin,
      |         'm' || CAST(user_id % 2 AS VARCHAR) AS field,
      |         CASE CAST((length(event_type) + (user_id % 2)) % 3 AS INTEGER)
      |           WHEN 0 THEN 'GAUGE' WHEN 1 THEN 'COUNTER' ELSE 'DERIVE' END AS dst,
      |         max(value) AS value
      |  FROM events GROUP BY 1, 2, 3, 4),
      |lagged AS (
      |  SELECT ts, plugin, field, dst, value,
      |         lag(value) OVER w AS pv, lag(ts) OVER w AS pt
      |  FROM samples WINDOW w AS (PARTITION BY plugin, field ORDER BY ts)),
      |vals AS (
      |  SELECT ts, plugin, field,
      |    CASE dst WHEN 'GAUGE' THEN value
      |      WHEN 'DERIVE' THEN (value - pv) / (ts - pt)
      |      ELSE CASE WHEN pv <= value THEN (value - pv) / (ts - pt)
      |                WHEN pv <= 4294967296.0 THEN (4294967296.0 - pv + value) / (ts - pt)
      |                ELSE (18446744073709551616.0 - pv + value) / (ts - pt) END
      |    END AS calc
      |  FROM lagged WHERE dst = 'GAUGE' OR pv IS NOT NULL)
      |SELECT ts, 'metricsets' AS type,
      |  'fact-courier.munin.' || plugin AS dataset,
      |  'fact-courier' AS metricset_module,
      |  'munin.' || plugin AS metricset_name,
      |  field, CAST(round(calc * 10000.0) AS BIGINT) AS value_e4
      |FROM vals ORDER BY ts, dataset, field""".stripMargin
}
