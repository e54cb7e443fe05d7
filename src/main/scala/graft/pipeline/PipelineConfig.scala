package graft.pipeline

import com.fasterxml.jackson.databind.JsonNode

import graft.functions.JsonFlatten
import graft.grok.Grok

/** Config-driven pipeline construction — the Log Carver `pipelines`
  * section (`lc-lib/processor/config.go:66-150`: a list of actions and
  * `if / else if / else` blocks) accepted as JSON (the reference parses
  * YAML/JSON into the same structures; this container ships Jackson's
  * JSON codec only). Example, mirroring the canonical nginx pipeline in
  * `testing/log-carver.yaml`:
  *
  * {{{
  * [
  *   {"if": "event.text.matches(\"^\\\\d\")",
  *    "then": [
  *      {"grok": {"field": "text", "patterns": ["^%{IPV4:client} ..."]}},
  *      {"date": {"field": "timestamp", "formats": ["02/Jan/2006:15:04:05 -0700"]}},
  *      {"add_tag": {"tag": "nginx"}}],
  *    "else if": [{"if": "...", "then": [...]}],
  *    "else": [{"add_tag": {"tag": "plain"}}]},
  *   {"set_field": {"field": "note", "value": "event.role"}}
  * ]
  * }}}
  */
object PipelineConfig {

  /** One entry of the prospector `files` section: the watch paths plus
    * the per-group event decoration (`lc-lib/prospector/config.go`:
    * `FileConfig` embeds the stream config's `fields` and `codecs`). The
    * full entry is retained in `raw` so codec parameters survive.
    */
  case class FileGroup(paths: Seq[String], fields: Map[String, String],
      codecNames: Seq[String], raw: JsonNode)

  /** A parsed full config document: the `pipelines` stages plus the
    * `files` section with `includes` already expanded.
    */
  case class ConfigDocument(stages: Seq[Stage], files: Seq[FileGroup])

  /** Load a config document from disk, expanding the `includes` section
    * the way the reference's prospector does
    * (`lc-lib/prospector/config.go:68-83,158`): each entry is a glob;
    * every matching file is a YAML/JSON document whose ROOT is a list of
    * file-group entries, appended to the main document's `files` in glob
    * order (`testing/log-courier-include.yaml` +
    * `log-courier-include-entry.yaml` is the canonical pair). Relative
    * globs resolve against the including file's directory (the reference
    * resolves against the process cwd, which it launches from the config
    * dir in its own tests). A group with no `paths` is a config error
    * (`validateFileConfigs`, config.go:128-141); a glob with no matches
    * is simply empty, like `filepath.Glob`.
    */
  def loadDocument(path: java.nio.file.Path, grok: Grok = Grok.default): ConfigDocument = {
    val text = java.nio.file.Files.readString(path)
    val root = parseTree(text, path.toString)
    val stages =
      if (root.isObject && root.has("pipelines"))
        fromReferenceAst(root.get("pipelines"), grok)
      else Seq.empty
    val base = Option(path.toAbsolutePath.getParent)
      .getOrElse(java.nio.file.Paths.get("/"))
    val own =
      if (root.isObject && root.has("files")) fileGroups(root.get("files"), path.toString)
      else Seq.empty
    val included =
      if (root.isObject && root.has("includes")) {
        val inc = root.get("includes")
        require(inc.isArray, s"'includes' must be a list of globs: $inc")
        import scala.jdk.CollectionConverters._
        inc.elements().asScala.toSeq.flatMap { g =>
          graft.util.Fs.glob(g.asText(), base).flatMap { f =>
            val sub = parseTree(java.nio.file.Files.readString(f), f.toString)
            require(sub.isArray,
              s"include $f must be a list of file-group entries (config.go:75-77)")
            fileGroups(sub, f.toString)
          }
        }
      } else Seq.empty
    ConfigDocument(stages, own ++ included)
  }

  private def parseTree(text: String, pathHint: String): JsonNode = {
    val lower = pathHint.toLowerCase
    val head = text.dropWhile(_.isWhitespace)
    if (lower.endsWith(".json") ||
        (!lower.endsWith(".yaml") && !lower.endsWith(".yml") &&
          (head.startsWith("[") || head.startsWith("{"))))
      JsonFlatten.mapper.readTree(text)
    else JsonFlatten.mapper.valueToTree(graft.util.Yaml.parse(text))
  }

  private def fileGroups(arr: JsonNode, where: String): Seq[FileGroup] = {
    require(arr.isArray, s"'files' must be a list of file groups ($where)")
    import scala.jdk.CollectionConverters._
    arr.elements().asScala.zipWithIndex.map { case (e, i) =>
      require(e.isObject && e.has("paths") && e.get("paths").isArray &&
        e.get("paths").size() > 0,
        s"no paths specified for /files[$i]/ ($where)")
      val paths = e.get("paths").elements().asScala.map(_.asText()).toSeq
      val fields =
        if (e.has("fields"))
          e.get("fields").properties().asScala
            .map(p => p.getKey -> p.getValue.asText()).toMap
        else Map.empty[String, String]
      val codecs =
        if (e.has("codecs"))
          e.get("codecs").elements().asScala
            .map(c => if (c.has("name")) c.get("name").asText() else c.fieldNames().next())
            .toSeq
        else Seq.empty
      FileGroup(paths, fields, codecs, e)
    }.toSeq
  }

  def fromJson(json: String, grok: Grok = Grok.default): Seq[Stage] = {
    val root = JsonFlatten.mapper.readTree(json)
    require(root.isArray, "pipeline config must be a JSON array of stages")
    parseStages(root, grok)
  }

  /** The reference's native config form — YAML (`lc-lib/config/parser.go`
    * feeds go-yaml; every shipped config under `testing/` is YAML).
    * Accepts either a full config document (the `pipelines` key is taken)
    * or a bare stage list, in the REFERENCE's AST shape: actions are
    * `name:`-keyed entries and conditionals are SIBLING entries merged by
    * a state machine (`lc-lib/processor/config.go:66-150`):
    *
    * {{{
    * pipelines:
    * - if: expression
    *   then:
    *   - name: grok
    *     field: message
    *     patterns: [...]
    * - else if: expression
    *   then:
    *   - name: add_tag
    *     tag: t
    * - else:
    *   - name: add_tag
    *     tag: u
    * }}}
    *
    * Our JSON dialect's single-key action objects are also accepted per
    * entry, so the two spellings can mix.
    */
  def fromYaml(yaml: String, grok: Grok = Grok.default): Seq[Stage] = {
    val parsed = graft.util.Yaml.parse(yaml)
    val root: JsonNode = JsonFlatten.mapper.valueToTree(parsed)
    val list =
      if (root.isObject && root.has("pipelines")) root.get("pipelines") else root
    require(list.isArray,
      "pipeline YAML must be a list of entries (or a config document with 'pipelines')")
    fromReferenceAst(list, grok)
  }

  /** Dialect dispatch for watched config files (live reload, admin
    * validate): extension decides when present; otherwise a JSON
    * document starts with `[`/`{` and anything else is YAML (the
    * reference's native form).
    */
  def fromText(text: String, pathHint: String = "", grok: Grok = Grok.default): Seq[Stage] = {
    val lower = pathHint.toLowerCase
    if (lower.endsWith(".yaml") || lower.endsWith(".yml")) fromYaml(text, grok)
    else if (lower.endsWith(".json")) fromJson(text, grok)
    else {
      val head = text.dropWhile(_.isWhitespace)
      if (head.startsWith("[") || head.startsWith("{")) fromJson(text, grok)
      else fromYaml(text, grok)
    }
  }

  /** State machine over sibling entries, mirroring `config.go:66-150`:
    * an `if` opens a conditional; following `else if` entries extend it;
    * a following `else` closes it; anything else (a `name:` action or a
    * single-key JSON-dialect stage) emits directly.
    */
  private def fromReferenceAst(arr: JsonNode, grok: Grok): Seq[Stage] = {
    import scala.jdk.CollectionConverters._
    val entries = arr.elements().asScala.toVector
    val out = scala.collection.mutable.ArrayBuffer.empty[Stage]
    var i = 0
    while (i < entries.length) {
      val e = entries(i)
      require(e.isObject, s"pipeline entry must be a mapping: $e")
      if (e.has("if")) {
        val branches = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[Stage])]
        require(e.has("then"), s"'if' entry missing its 'then' action list: $e")
        branches += e.get("if").asText() -> fromReferenceAst(e.get("then"), grok)
        i += 1
        while (i < entries.length && entries(i).has("else if")) {
          require(entries(i).has("then"),
            s"'else if' entry missing its 'then' action list: ${entries(i)}")
          branches += entries(i).get("else if").asText() ->
            fromReferenceAst(entries(i).get("then"), grok)
          i += 1
        }
        val otherwise =
          if (i < entries.length && entries(i).has("else")) {
            val o = fromReferenceAst(entries(i).get("else"), grok)
            i += 1
            o
          } else Seq.empty
        out += ConditionalStage(branches.toSeq, otherwise)
      } else if (e.has("else if") || e.has("else")) {
        throw new IllegalArgumentException(
          s"'else if'/'else' without a preceding 'if' (config.go:120-137): $e")
      } else if (e.has("name")) {
        out += parseAction(e.get("name").asText(), e, grok)
        i += 1
      } else {
        out += parseStage(e, grok)
        i += 1
      }
    }
    out.toSeq
  }

  private def parseStages(arr: JsonNode, grok: Grok): Seq[Stage] = {
    import scala.jdk.CollectionConverters._
    arr.elements().asScala.map(parseStage(_, grok)).toSeq
  }

  private def strings(n: JsonNode): Seq[String] = {
    import scala.jdk.CollectionConverters._
    n.elements().asScala.map(_.asText()).toSeq
  }

  private def parseStage(node: JsonNode, grok: Grok): Stage = {
    require(node.isObject, s"stage must be an object: $node")
    if (node.has("if")) {
      val branches = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[Stage])]
      require(node.has("then"), s"'if' stage missing its 'then' action list: $node")
      branches += node.get("if").asText() -> parseStages(node.get("then"), grok)
      if (node.has("else if")) {
        import scala.jdk.CollectionConverters._
        for (b <- node.get("else if").elements().asScala) {
          require(b.has("if") && b.has("then"),
            s"'else if' branch needs 'if' and 'then': $b")
          branches += b.get("if").asText() -> parseStages(b.get("then"), grok)
        }
      }
      val otherwise =
        if (node.has("else")) parseStages(node.get("else"), grok) else Seq.empty
      return ConditionalStage(branches.toSeq, otherwise)
    }
    val name = node.fieldNames().next()
    parseAction(name, node.get(name), grok)
  }

  /** One action from its name + config mapping. The reference's YAML shape
    * passes the entry itself as `cfg` (params sit beside `name`, which the
    * registrars never read — `config.go:154-165` deletes it); the JSON
    * dialect passes the single key's value.
    */
  private def parseAction(name: String, cfg: JsonNode, grok: Grok): Stage = {
    def str(f: String, default: String = null): String =
      if (cfg.has(f)) cfg.get(f).asText() else default
    def bool(f: String): Boolean = cfg.has(f) && cfg.get(f).asBoolean()
    name match {
      case "grok" =>
        val localPatterns =
          if (cfg.has("local patterns")) {
            import scala.jdk.CollectionConverters._
            cfg.get("local patterns").properties().asScala
              .map(e => e.getKey -> e.getValue.asText()).toMap
          } else Map.empty[String, String]
        GrokStage(str("field"), strings(cfg.get("patterns")), bool("remove"),
          localPatterns, grok)
      case "date" => DateStage(str("field"), strings(cfg.get("formats")), bool("remove"))
      case "json" => JsonStage(str("field"), bool("remove"))
      case "kv" => KvStage(str("field"), str("prefix", ""))
      case "set_field" => SetFieldStage(str("field"), str("value"))
      case "unset_field" => UnsetFieldStage(str("field"))
      case "add_tag" => AddTagStage(str("tag"))
      case "remove_tag" => RemoveTagStage(str("tag"))
      case "filter" => FilterStage(strings(cfg.get("patterns")),
        str("match", "any"), str("field", "text"))
      case "user_agent" =>
        // optional `database`: a uap-core regexes.yaml/JSON file (the
        // reference embeds it via uap-go; actionuseragent.go:50-112);
        // without one the built-in major-family subset applies
        val rules = Option(str("database")).map(graft.functions.UapRules.fromFile)
        UserAgentStage(str("field"), bool("remove"), rules)
      case "geoip" =>
        // the reference's `database` is an mmdb path — a real MaxMind
        // file is read natively (graft.enrich.Mmdb); alternatively the
        // lookup records come inline (`records`) or as a JSON file path
        // (`database` ending .json) of the GeoRecord shape
        if (cfg.has("database") && cfg.get("database").asText().endsWith(".mmdb"))
          return GeoIpMmdbStage(str("field"), cfg.get("database").asText(),
            str("target", "source[geo]"))
        val recsNode =
          if (cfg.has("records")) cfg.get("records")
          else if (cfg.has("database"))
            JsonFlatten.mapper.readTree(
              java.nio.file.Files.readString(java.nio.file.Paths.get(cfg.get("database").asText())))
          else throw new IllegalArgumentException("geoip needs 'records' or 'database'")
        import scala.jdk.CollectionConverters._
        val recs = recsNode.elements().asScala.map { r =>
          def s(f: String): String = if (r.has(f)) r.get(f).asText() else ""
          graft.enrich.GeoRecord(s("ip"), s("city_name"), s("continent_name"),
            s("country_iso_code"), s("country_name"),
            r.get("longitude").asDouble(), r.get("latitude").asDouble(),
            s("postal_code"), s("timezone"), s("region_iso_code"), s("region_name"))
        }.toSeq
        GeoIpStage(str("field"), recs, str("target", "source[geo]"))
      case other => throw new IllegalArgumentException(s"unknown action: $other")
    }
  }
}
