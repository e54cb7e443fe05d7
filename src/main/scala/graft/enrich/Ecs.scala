package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream decoration envelope modes — `StreamConfig.Decorate`
  * (`lc-lib/event/stream.go:72-114`) plus the codec-stream `path`/`offset`
  * decoration (`lc-lib/codecs/stream.go:123-134`), in both wire shapes
  * (`docs/Events.md:16-45`):
  *
  *   - default (flat): `host` string, `timezone` string, `path` string,
  *     `offset` long;
  *   - `enable ecs`: `host.name`/`host.hostname` struct, `event.timezone`
  *     struct, `log.file.path` + `log.offset` struct. NOT backwards
  *     compatible with the flat shape, exactly like the reference.
  *
  * `host`/`timezone` are per-stream configuration values in the reference
  * (one stream = one file/connection); our streams are keyed slices of the
  * table, so the decorator takes Columns — pass `lit(...)` for the
  * single-stream case.
  */
final case class EcsConfig(
    addHostField: Boolean = true,       // `add host field`, default true (stream.go:29)
    addTimezoneField: Boolean = false,  // `add timezone field`, default false
    addTimezoneNameField: Boolean = false,
    enableEcs: Boolean = false,         // `enable ecs`, default false (stream.go:31)
    addPathField: Boolean = true,       // `add path field`, default true (harvester/config.go:31)
    addOffsetField: Boolean = true      // `add offset field`, default true (codecs/stream.go:29)
)

object Ecs {

  /** Decorate a frame with the envelope fields in the configured shape.
    * Pure column projection — no shuffle, stays inside whole-stage codegen.
    *
    * @param host     the `general/host` config value (stream.go:76-85)
    * @param timezone the `-0700 MST`-shaped zone string (stream.go:52)
    * @param path     `path` / ECS `log.file.path` (codecs/stream.go:123-134)
    * @param offset   `offset` / ECS `log.offset`
    */
  def decorate(df: DataFrame, cfg: EcsConfig,
      host: Column, timezone: Column, timezoneName: Column,
      path: Column, offset: Column): DataFrame = {
    var out = df
    if (cfg.enableEcs) {
      if (cfg.addHostField)
        out = out.withColumn("host",
          struct(host.as("name"), host.as("hostname")))
      if (cfg.addTimezoneField)
        out = out.withColumn("event", struct(timezone.as("timezone")))
      // `log` carries only the enabled parts (harvester.go:401 path,
      // codecs/stream.go:125 offset — independently toggleable)
      val logParts =
        (if (cfg.addPathField) Seq(struct(path.as("path")).as("file")) else Nil) ++
        (if (cfg.addOffsetField) Seq(offset.cast("long").as("offset")) else Nil)
      if (logParts.nonEmpty) out = out.withColumn("log", struct(logParts: _*))
    } else {
      if (cfg.addHostField) out = out.withColumn("host", host)
      if (cfg.addTimezoneField) out = out.withColumn("timezone", timezone)
      if (cfg.addPathField) out = out.withColumn("path", path)
      if (cfg.addOffsetField) out = out.withColumn("offset", offset.cast("long"))
    }
    // `add timezone name field` has no ECS variant in the reference
    // (stream.go:100-102) — flat in both modes
    if (cfg.addTimezoneNameField) out = out.withColumn("timezone_name", timezoneName)
    out
  }
}
