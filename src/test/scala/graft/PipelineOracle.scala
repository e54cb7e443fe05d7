package graft

import java.sql.Timestamp
import java.time.OffsetDateTime
import java.time.format.DateTimeFormatter
import java.util.Locale

import graft.functions.{JsonFlatten, KvParse}
import graft.grok.{Grok, GrokHint}
import graft.model.Turn

/** Row-at-a-time oracle for the flagship pipeline (FIXTURES.md §5):
  * re-implements the reference's per-event semantics naively — sequential
  * conditional branches, grok regex apply, kv FSM, json merge, tag-set
  * invariants, first-match sink routing — and is compared 1:1 against the
  * vectorised engine output.
  */
object PipelineOracle {

  final case class Result(
      turn: Turn,
      tags: List[String],
      fields: Map[String, String],
      eventTs: Timestamp,
      sink: String)

  private val nginxBranch = java.util.regex.Pattern.compile("^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3} ")
  private val kvBranch = java.util.regex.Pattern.compile("^[a-z]+=")
  private val nginxGrok = Grok.default.compile(Grok.NginxAccess)
  private val httpDate = DateTimeFormatter.ofPattern("dd/MMM/yyyy:HH:mm:ss xx", Locale.US)

  private def addTag(tags: List[String], t: String): List[String] =
    (tags :+ t).distinct.sorted.take(1024)

  def process(turn: Turn): Result = {
    var tags = List.empty[String]
    var fields = Map.empty[String, String]
    var eventTs = turn.ts

    if (nginxBranch.matcher(turn.text).find()) {
      val m = nginxGrok.pattern.matcher(turn.text)
      if (m.find()) {
        for (f <- nginxGrok.fields) {
          val g = m.group(f.group)
          if (g != null) fields += f.name -> g
        }
        // date action on the captured HTTPDATE
        fields.get("timestamp") match {
          case Some(ts) =>
            try eventTs = Timestamp.from(OffsetDateTime.parse(ts, httpDate).toInstant)
            catch {
              case _: Exception =>
                tags = addTag(tags, "_date_failure")
                fields += "_date_error" -> "Field 'timestamp' could not be parsed with any of the given formats"
            }
          case None =>
            tags = addTag(tags, "_date_failure")
            fields += "_date_error" -> "Field 'timestamp' could not be parsed with any of the given formats"
        }
      } else {
        tags = addTag(tags, "_grok_failure")
        fields += "_grok_error" -> "Field 'text' did not match any of the given patterns"
        // date action then fails too (timestamp field absent)
        tags = addTag(tags, "_date_failure")
        fields += "_date_error" -> "Field 'timestamp' could not be parsed with any of the given formats"
      }
      tags = addTag(tags, "nginx")
    } else if (kvBranch.matcher(turn.text).find()) {
      val parsed = KvParse.parse(turn.text)
      if (parsed == null) {
        tags = addTag(tags, "_kv_failure")
        fields += "_kv_error" -> "Parsing interrupted"
      } else fields ++= parsed
      tags = addTag(tags, "kv")
    } else if (turn.text.startsWith("{")) {
      val node = try JsonFlatten.mapper.readTree(turn.text) catch { case _: Exception => null }
      if (node == null || !node.isObject) {
        tags = addTag(tags, "_json_failure")
        fields += "_json_error" -> "Field 'text' could not be unmarshalled"
      } else {
        val it = node.fields()
        while (it.hasNext) {
          val e = it.next()
          fields += e.getKey -> JsonFlatten.render(e.getValue)
        }
      }
      tags = addTag(tags, "json")
    } else {
      tags = addTag(tags, "plain")
    }

    val sink =
      if (turn.tool != "none") "sink_tools"
      else if (tags.contains("_grok_failure") || turn.role == "system") "sink_errors"
      else "sink_main"

    Result(turn, tags, fields, eventTs, sink)
  }
}
