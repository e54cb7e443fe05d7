package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Go `strings.Replace(s, old, new, n)` as one fused codegen'd expression —
  * the execution shape behind cel-go ext.Strings' bounded-count
  * `replace(old, new, count)` (cel-go delegates verbatim to the Go
  * standard library; reference env: `lc-lib/processor/cel.go:40-44`).
  *
  * Exact Go semantics, all operands fully dynamic columns:
  *   - `n < 0`: replace every occurrence (ReplaceAll);
  *   - `n = 0`: return `s` unchanged;
  *   - `n > 0`: replace only the first `n` non-overlapping occurrences,
  *     scanning left to right;
  *   - `old = ""` (the insert-between-runes case, strings.go): insert
  *     `new` before the first rune, then after every rune — up to
  *     `utf8.RuneCount(s) + 1` insertions, bounded by `n`.
  *
  * Occurrence search is byte-wise, which is UTF-8-safe for a non-empty
  * `old`: a valid UTF-8 needle can only match at rune boundaries of a
  * valid UTF-8 haystack (lead/continuation byte ranges are disjoint).
  * The empty-`old` path walks rune boundaries explicitly via the UTF-8
  * lead-byte width table (`numBytesForFirstByte` equivalent: bytes with
  * high bits `10` are continuations and never boundaries).
  */
case class GoStrReplace(str: Expression, search: Expression,
    replacement: Expression, count: Expression) extends QuaternaryExpression {

  override def first: Expression = str
  override def second: Expression = search
  override def third: Expression = replacement
  override def fourth: Expression = count

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "go_str_replace"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = str.dataType == StringType && search.dataType == StringType &&
      replacement.dataType == StringType &&
      count.dataType.isInstanceOf[org.apache.spark.sql.types.LongType]
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (string, string, string, bigint), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def nullSafeEval(s: Any, o: Any, n: Any, c: Any): Any =
    compute(s.asInstanceOf[UTF8String], o.asInstanceOf[UTF8String],
      n.asInstanceOf[UTF8String], c.asInstanceOf[java.lang.Long].longValue())

  def compute(sU: UTF8String, oU: UTF8String, nU: UTF8String, cnt: Long): UTF8String = {
    if (cnt == 0L) return sU
    val s = sU.getBytes
    val o = oU.getBytes
    val n = nU.getBytes
    val out = new java.io.ByteArrayOutputStream(s.length + n.length)
    var replaced = 0L
    // cnt < 0 = unbounded (Go); clamp the budget once instead of testing
    // the sign inside the scan loop
    val budget = if (cnt < 0) Long.MaxValue else cnt
    var i = 0
    if (o.isEmpty) {
      // insert `new` at the start and after every rune, up to budget times
      if (replaced < budget) { out.write(n); replaced += 1 }
      while (i < s.length) {
        // copy one rune, sized exactly like Go utf8.DecodeRune: an invalid
        // sequence (stray continuation, bad lead, truncated or
        // out-of-accept-range continuation — overlongs, surrogates, >U+10FFFF)
        // is a 1-byte RuneError, NOT a maximal continuation run
        val len = runeLen(s, i)
        out.write(s, i, len)
        i += len
        if (replaced < budget) { out.write(n); replaced += 1 }
      }
    } else {
      while (i < s.length) {
        if (replaced < budget && i + o.length <= s.length && regionMatches(s, i, o)) {
          out.write(n)
          replaced += 1
          i += o.length
        } else {
          out.write(s(i))
          i += 1
        }
      }
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  /** Byte length of the rune at `i` under Go `utf8.DecodeRune` rules
    * (`unicode/utf8`: leads C2-F4 with per-lead first-continuation accept
    * ranges rejecting overlongs / surrogates / >U+10FFFF; anything
    * invalid decodes as a 1-byte RuneError).
    */
  private def runeLen(s: Array[Byte], i: Int): Int = {
    val b0 = s(i) & 0xff
    if (b0 < 0x80) return 1
    if (b0 < 0xc2 || b0 > 0xf4) return 1 // stray continuation / C0-C1 / F5+
    val n = if (b0 < 0xe0) 2 else if (b0 < 0xf0) 3 else 4
    if (i + n > s.length) return 1 // truncated sequence
    val b1 = s(i + 1) & 0xff
    val lo = b0 match { case 0xe0 => 0xa0; case 0xf0 => 0x90; case _ => 0x80 }
    val hi = b0 match { case 0xed => 0x9f; case 0xf4 => 0x8f; case _ => 0xbf }
    if (b1 < lo || b1 > hi) return 1
    var j = 2
    while (j < n) {
      val bj = s(i + j) & 0xff
      if (bj < 0x80 || bj > 0xbf) return 1
      j += 1
    }
    n
  }

  private def regionMatches(s: Array[Byte], at: Int, o: Array[Byte]): Boolean = {
    var j = 0
    while (j < o.length) {
      if (s(at + j) != o(j)) return false
      j += 1
    }
    true
  }

  // stays inside the whole-stage codegen span; the scan itself is a
  // reference-obj call (a byte-wise FSM gains nothing from inlined Java)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("goStrReplace", this, classOf[GoStrReplace].getName)
    nullSafeCodeGen(ctx, ev, (s, o, n, c) =>
      s"${ev.value} = $ref.compute($s, $o, $n, $c);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): GoStrReplace = copy(f, s, t, q)
}
