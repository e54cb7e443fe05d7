package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic transcripts generator (FIXTURES.md §1-2).
  *
  * Pure function of (seed, convIdx, turnIdx) so the exact same rows can be
  * produced distributed (`spark.range(nConvs).flatMap`) and in-memory for
  * the row-at-a-time oracle — no wall clock, no external data.
  *
  * Skew: every 100th conversation is a heavy hitter with ~40× the turns of
  * a normal one, so ~1% of conv_ids own ~30% of all turns (exercises the
  * salting / AQE-skew path required by the north rule).
  *
  * Text corpora model the reference's fixtures: nginx access lines (the
  * canonical grok pipeline in `testing/log-carver.yaml`), multiline stack
  * traces (`testing/multiline.log` shape: continuation lines match `^\s`),
  * kv lines incl. malformed tails (`lc-lib/processor/actionkv.go` FSM error
  * cases), JSON object lines, `gem line test %d` order/content lines
  * (`ruby/log-courier/spec/gem_spec.rb:30-43`) and garbage/edge lines.
  */
object TranscriptGen {

  val BaseEpochSec: Long = 1767225600L // 2026-01-01T00:00:00Z

  // splitmix64 — stable across JVM versions, cheap, well-mixed.
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def h(seed: Long, a: Long, b: Long = 0, c: Long = 0): Long =
    mix(mix(mix(mix(seed) ^ a) ^ b) ^ c)
  /** Uniform in [0, n) — non-negative. */
  def hmod(seed: Long, a: Long, b: Long, n: Int): Int =
    (((h(seed, a, b) >>> 1) % n).toInt)

  private val roles = Array("user", "assistant", "system", "tool")
  // weighted 40/40/5/15
  private def rolePick(r: Int): String =
    if (r < 40) "user" else if (r < 80) "assistant" else if (r < 85) "system" else "tool"
  private val tools = Array("search", "code", "browser")

  private val ipOcts = Array(10, 23, 98, 172, 192, 8, 44, 201)
  private val paths = Array("/index.html", "/api/v1/items", "/static/app.js",
    "/login", "/search?q=spark", "/healthz", "/img/logo.png", "/api/v1/users")
  private val verbs = Array("GET", "POST", "PUT", "DELETE")
  private val statuses = Array(200, 200, 200, 301, 404, 500, 503, 204)
  private val agents = Array("Mozilla/5.0", "curl/8.0", "Go-http-client/1.1", "python-requests/2.31")
  private val months = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  private val levels = Array("info", "warn", "error", "debug")
  private val exceptions = Array("NullPointerException", "IOException",
    "IllegalStateException", "TimeoutException")

  def nginxLine(seed: Long, c: Long, t: Long): String = {
    val ip = s"${ipOcts(hmod(seed, c, t + 1, 8))}.${hmod(seed, c, t + 2, 256)}.${hmod(seed, c, t + 3, 256)}.${hmod(seed, c, t + 4, 254) + 1}"
    val day = hmod(seed, c, t + 5, 28) + 1
    val mon = months(hmod(seed, c, t + 6, 12))
    val hh = hmod(seed, c, t + 7, 24); val mm = hmod(seed, c, t + 8, 60); val ss = hmod(seed, c, t + 9, 60)
    val verb = verbs(hmod(seed, c, t + 10, 4))
    val path = paths(hmod(seed, c, t + 11, 8))
    val status = statuses(hmod(seed, c, t + 12, 8))
    val bytes = hmod(seed, c, t + 13, 100000)
    val agent = agents(hmod(seed, c, t + 14, 4))
    val reqt = hmod(seed, c, t + 15, 10000) / 1000.0
    f"$ip%s - frank [$day%02d/$mon%s/2026:$hh%02d:$mm%02d:$ss%02d +0000] " +
      f""""$verb%s $path%s HTTP/1.1" $status%d $bytes%d "-" "$agent%s" $reqt%.3f"""
  }

  def kvLine(seed: Long, c: Long, t: Long): String = {
    val a = hmod(seed, c, t + 21, 1000)
    val b = hmod(seed, c, t + 22, 100)
    val w = paths(hmod(seed, c, t + 23, 8))
    val malformed = hmod(seed, c, t + 24, 13) == 0
    if (malformed) s"""alpha=$a beta="unterminated value $b"""
    else s"""alpha=$a beta="two words $b" gamma='it\\'s quoted' path=$w"""
  }

  def jsonLine(seed: Long, c: Long, t: Long): String = {
    val lvl = levels(hmod(seed, c, t + 31, 4))
    val code = hmod(seed, c, t + 32, 600)
    s"""{"level":"$lvl","msg":"unit $c processed","code":$code}"""
  }

  def plainLine(c: Long, t: Long): String = s"gem line test ${c * 1000 + t}"

  def traceHead(seed: Long, c: Long, t: Long): String =
    s"${exceptions(hmod(seed, c, t + 41, 4))}: failure in request ${hmod(seed, c, t + 42, 10000)}"
  def traceCont(seed: Long, c: Long, t: Long): String =
    s"    at svc.Handler.run(Handler.scala:${hmod(seed, c, t + 43, 900) + 10})"

  def edgeLine(seed: Long, c: Long, t: Long): String =
    hmod(seed, c, t + 51, 4) match {
      case 0 => ""
      case 1 => "x" * 9000 // oversize vs a small max-line cap
      case 2 => s"ts=not-a-timestamp value=${hmod(seed, c, t + 52, 100)}"
      case 3 => "plain line with no structure at all"
    }

  def convLen(seed: Long, c: Long): Int = {
    val base = 4 + hmod(seed, c, -1, 12)
    if (c % 100 == 0) base * 40 else base
  }

  def convId(c: Long): String = f"conv-$c%06d"

  /** All turns of one conversation, in turn_idx order. */
  def turnsFor(seed: Long, c: Long): IndexedSeq[Turn] = {
    val len = convLen(seed, c)
    val out = new scala.collection.mutable.ArrayBuffer[Turn](len)
    var t = 0
    var tsSec = BaseEpochSec + (c % 100000) * 137
    var contLeft = 0
    while (t < len) {
      val corpus = hmod(seed, c, t.toLong + 1000000, 100)
      val text =
        if (contLeft > 0) { contLeft -= 1; traceCont(seed, c, t) }
        else if (corpus < 30) nginxLine(seed, c, t)
        else if (corpus < 45) { contLeft = 1 + hmod(seed, c, t + 61, 4); traceHead(seed, c, t) }
        else if (corpus < 60) kvLine(seed, c, t)
        else if (corpus < 70) jsonLine(seed, c, t)
        else if (corpus < 95) plainLine(c, t)
        else edgeLine(seed, c, t)
      val role = rolePick(hmod(seed, c, t + 71, 100))
      val tool =
        if (role == "tool") tools(hmod(seed, c, t + 72, 3))
        else if (hmod(seed, c, t + 73, 5) == 0) tools(hmod(seed, c, t + 74, 3))
        else "none"
      // monotone within the conversation; occasional large gap to exercise
      // session windows (the `previous timeout` analog)
      tsSec += 1 + hmod(seed, c, t + 81, 30) +
        (if (hmod(seed, c, t + 82, 20) == 0) 900 else 0)
      out += Turn(convId(c), t, role, text, tool, new Timestamp(tsSec * 1000L))
      t += 1
    }
    out.toIndexedSeq
  }

  /** Turns of one conversation in *storage* order — a deterministic
    * permutation, so downstream must restore (conv_id, turn_idx) order
    * rather than assume it (FIXTURES.md §1).
    */
  def storageOrderTurnsFor(seed: Long, c: Long): IndexedSeq[Turn] =
    turnsFor(seed, c).sortBy(t => h(seed, c, t.turn_idx + 5000000L))

  /** In-memory generation (tests / oracle). */
  def generateLocal(seed: Long, nConvs: Long): IndexedSeq[Turn] =
    (0L until nConvs).flatMap(c => storageOrderTurnsFor(seed, c))

  /** Distributed generation: one task per conv range; rows appear in
    * storage (shuffled) order within each conversation.
    */
  def generate(spark: SparkSession, seed: Long, nConvs: Long,
      parallelism: Int = 32): Dataset[Turn] = {
    import spark.implicits._
    spark.range(0L, nConvs, 1L, parallelism)
      .flatMap(c => storageOrderTurnsFor(seed, c))
  }
}
