package graft.grok

import scala.collection.mutable

/** Grok type hints (`lc-lib/grok/types.go:27-66`): `string` (default),
  * `int`, `float`. Conversions never fail — unparseable values become the
  * zero value, mirroring the reference's `convertToType`.
  */
sealed trait GrokHint
object GrokHint {
  case object HString extends GrokHint
  case object HInt extends GrokHint
  case object HFloat extends GrokHint
  def parse(s: String): GrokHint = s match {
    case "string" => HString
    case "int"    => HInt
    case "float"  => HFloat
    case other => throw new IllegalArgumentException(s"invalid type hint: $other")
  }
}

/** One named capture of a compiled grok pattern: the user-facing field name
  * (may be an `a[b][c]` path), the sanitised Java group name actually used
  * in the regex, and the type hint.
  */
final case class GrokField(name: String, group: String, hint: GrokHint)

/** A fully expanded grok pattern: a single Java regex with uniquely named
  * groups — the reference expands `%{NAME:field:type}` specs at compile
  * time into one Go regex the same way (`lc-lib/grok/grok.go:243-295`).
  */
final case class CompiledGrok(regex: String, fields: Seq[GrokField]) {
  @transient lazy val pattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(regex)
  // Matcher allocates working arrays; reuse one per thread (reset() is
  // the documented reuse path) — measurable on multi-million-row scans
  @transient private lazy val matcherTL: ThreadLocal[java.util.regex.Matcher] =
    ThreadLocal.withInitial(() => pattern.matcher(""))
  def matcher(s: CharSequence): java.util.regex.Matcher = matcherTL.get().reset(s)
}

/** Grok pattern compiler.
  *
  * Semantics follow `lc-lib/grok/grok.go`:
  *   - `%{NAME}` inlines the named sub-pattern without capturing;
  *   - `%{NAME:field}` wraps it in a capture group bound to `field`;
  *   - `%{NAME:field:type}` additionally records an int/float hint;
  *   - definition order is irrelevant (the reference uses a pending/resume
  *     graph, `grok.go:299-340`; we resolve recursively with cycle
  *     detection — same acyclic semantics);
  *   - sub-patterns may themselves contain `%{...}` specs (e.g.
  *     SYSLOGPROG captures `program`/`pid`).
  * Divergence from Go: capture groups are emitted as Java `(?<gN>...)`
  * with sequential sanitised names, because Java group-name syntax is
  * stricter than Go's and duplicate field names must stay unique.
  */
class Grok(loadDefaults: Boolean = true) {
  private val patterns = mutable.Map.empty[String, String]
  if (loadDefaults) patterns ++= GrokPatterns.builtin

  def addPattern(name: String, pattern: String): Unit = patterns(name) = pattern

  /** `NAME PATTERN` per line; blank lines and `#` comments skipped
    * (`lc-lib/grok/grok.go:176-207` file format).
    */
  def addPatternsFromLines(lines: Iterator[String]): Unit =
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).foreach { l =>
      val sp = l.indexOf(' ')
      require(sp > 0, s"bad pattern line: $l")
      addPattern(l.substring(0, sp), l.substring(sp + 1).trim)
    }

  /** Pattern names the spec needs but the registry lacks — TRANSITIVE,
    * like the reference's `MissingPatterns` (a present pattern whose own
    * definition references an absent one is still a miss; a caller using
    * this as the pre-flight gate must not get a false all-clear and then
    * a hard `compile` failure).
    */
  def missingPatterns(spec: String): Seq[String] = {
    val missing = mutable.LinkedHashSet.empty[String]
    val visited = mutable.Set.empty[String]
    def scan(s: String): Unit =
      Grok.SpecRe.findAllMatchIn(s).map(_.group(1)).foreach { name =>
        if (visited.add(name)) {
          patterns.get(name) match {
            case Some(defn) => scan(defn)
            case None => missing += name
          }
        }
      }
    scan(spec)
    missing.toSeq
  }

  def compile(spec: String, localPatterns: Map[String, String] = Map.empty): CompiledGrok = {
    val fields = mutable.ArrayBuffer.empty[GrokField]
    val seen = mutable.Set.empty[String]

    def lookup(name: String): String =
      localPatterns.getOrElse(name, patterns.getOrElse(name,
        throw new IllegalArgumentException(s"missing grok pattern: $name")))

    def expand(s: String, stack: List[String]): String = {
      val m = Grok.SpecRe.pattern.matcher(s)
      val out = new java.lang.StringBuilder
      var last = 0
      while (m.find()) {
        out.append(s, last, m.start())
        val name = m.group(1)
        val field = Option(m.group(2))
        val hint = Option(m.group(3)).map(GrokHint.parse).getOrElse(GrokHint.HString)
        require(!stack.contains(name), s"circular grok pattern reference: $name")
        val sub = expand(lookup(name), name :: stack)
        field match {
          case Some(f) =>
            val g = s"g${fields.length}"
            fields += GrokField(f, g, hint)
            out.append("(?<").append(g).append(">").append(sub).append(")")
          case None =>
            out.append("(?:").append(sub).append(")")
        }
        last = m.end()
      }
      out.append(s, last, s.length)
      out.toString
    }

    val regex = expand(spec, Nil)
    // fail closed NOW on spec syntax SpecRe couldn't consume (e.g. the
    // reference rejects %{WORD:a:b:c} at compile; a dash in a name) —
    // left verbatim it would surface as a lazy PatternSyntaxException on
    // an executor at first match, an obscure task failure instead of a
    // config error
    val leftover = regex.indexOf("%{")
    require(leftover < 0,
      s"invalid grok spec syntax at '${regex.substring(leftover.max(0),
        math.min(regex.length, leftover.max(0) + 30))}...' in: $spec")
    // keep first occurrence when a field name repeats (Go map overwrote;
    // first-wins is deterministic and documented here)
    val uniq = fields.filter(f => seen.add(f.name))
    CompiledGrok(regex, uniq.toSeq)
  }
}

object Grok {
  /** `%{NAME}`, `%{NAME:field}`, `%{NAME:field:type}` — field may use the
    * `a[b][c]` path syntax or dots (`grok.go:254` splits on ':', max 3).
    */
  val SpecRe = "%\\{(\\w+)(?::([\\w@\\[\\].-]+))?(?::(\\w+))?\\}".r

  lazy val default = new Grok(loadDefaults = true)

  /** The canonical nginx access-line pipeline pattern shape
    * (`testing/log-carver.yaml`): client IP, user, HTTP date, request,
    * typed response / bytes / request-time captures.
    */
  val NginxAccess: String =
    "^%{IPV4:client} - %{USER:user} \\[%{HTTPDATE:timestamp}\\] " +
      "\"%{WORD:verb} %{NOTSPACE:request} HTTP/%{NUMBER:httpversion}\" " +
      "%{NUMBER:response:int} %{NUMBER:bytes:int} \"%{DATA:referrer}\" " +
      "\"%{DATA:agent}\" %{NUMBER:requesttime:float}"
}
