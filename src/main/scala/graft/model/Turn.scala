package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** The input row shape (BASELINE.json `input_hint`): one turn of a
  * multi-turn agent transcript. This is the analog of the reference's
  * dynamic Event map (`lc-lib/event/event.go:47-53`) narrowed to the fixed
  * transcript envelope; dynamic extracted fields live in the `fields`
  * map column of [[Envelope]] instead of a schemaless map.
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp
)

object Turn {
  val schema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("tool", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false)
  ))
}

/** Envelope columns the pipeline adds on top of [[Turn]] — the Spark
  * re-expression of the reference event's built-in fields
  * (`lc-lib/event/event.go:102-154`):
  *   - `tags`: sorted, deduplicated, capped array (`event.go:300-334`)
  *   - `fields`: map of extracted dynamic fields
  *   - `event_ts`: the parsed `@timestamp` analog (`event.go:129-151`)
  * `_meta`-style columns must be dropped before any sink write
  * (`event.go:346-354` strips `@metadata` on serialisation).
  */
object Envelope {
  val TagsCol = "tags"
  val FieldsCol = "fields"
  val EventTsCol = "event_ts"
  /** Columns never serialised to a sink (the `@metadata` analog). */
  val MetaPrefix = "_meta"

  /** Max entries in the tags array (`lc-lib/event/event.go:307`). */
  val MaxTags = 1024
}
