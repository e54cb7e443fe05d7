package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.model.TranscriptGen
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query: the full parse → enrich → route → aggregate pipeline
    * over deterministically synthesised transcripts (BASELINE.json
    * input_hint shape); driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val turns = TranscriptGen.generate(spark, seed = 42L, nConvs = 200L, parallelism = 8).toDF()
    TranscriptPipeline.aggregates(spark, turns)
  }
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map()
}
