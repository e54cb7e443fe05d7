package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Go `strconv.Quote(s)` as one fused codegen'd expression — the
  * execution shape behind cel-go ext.Strings' `quote()` (which delegates
  * verbatim to strconv.Quote; reference env `lc-lib/processor/cel.go:40`).
  *
  * Full strconv.Quote semantics, not just the common escapes:
  *   - `"` → `\"`, `\` → `\\`;
  *   - `\a \b \f \n \r \t \v` for their controls;
  *   - every other byte < 0x20 and DEL (0x7f) → `\xNN` (so ANSI color
  *     codes etc. become valid quoted-literal text, never raw bytes);
  *   - printable ASCII raw;
  *   - non-ASCII runes: raw when printable, else `\uNNNN` / `\UNNNNNNNN`;
  *   - invalid UTF-8 bytes → `\xNN` (Go quotes each invalid byte).
  *
  * Printability for non-ASCII approximates Go `unicode.IsPrint` with the
  * JVM's category tables (letters, marks, numbers, punctuation, symbols,
  * plus U+0020): the two standard libraries can disagree on characters
  * whose category changed between their embedded Unicode versions —
  * bounded, documented divergence; the security-relevant classes
  * (controls, separators, unassigned) escape identically.
  */
case class GoQuote(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "go_quote"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"go_quote requires STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length + 2)
    sb.append('"')
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cp match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case 0x07 => sb.append("\\a")
        case 0x08 => sb.append("\\b")
        case 0x0c => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case 0x0b => sb.append("\\v")
        case c if c < 0x20 || c == 0x7f =>
          sb.append(f"\\x$c%02x")
        case c if c < 0x7f => sb.appendCodePoint(c) // printable ASCII
        case c if GoQuote.isPrint(c) => sb.appendCodePoint(c)
        case c if c <= 0xffff =>
          // an unpaired surrogate is invalid UTF-8 on the wire — Go
          // quotes the replacement path as �; the JVM string layer
          // has already substituted it, so the escape is table-driven
          sb.append(f"\\u$c%04x")
        case c => sb.append(f"\\U$c%08x")
      }
      i += Character.charCount(cp)
    }
    sb.append('"')
    UTF8String.fromString(sb.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("goQuote", this, classOf[GoQuote].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(c: Expression): GoQuote = copy(c)
}

object GoQuote {
  /** Go `unicode.IsPrint` approximation: L*, M*, N*, P*, S* categories
    * plus the ASCII space.
    */
  private[functions] def isPrint(cp: Int): Boolean = {
    if (cp == 0x20) return true
    val t = Character.getType(cp)
    t match {
      case Character.UPPERCASE_LETTER | Character.LOWERCASE_LETTER |
           Character.TITLECASE_LETTER | Character.MODIFIER_LETTER |
           Character.OTHER_LETTER |
           Character.NON_SPACING_MARK | Character.ENCLOSING_MARK |
           Character.COMBINING_SPACING_MARK |
           Character.DECIMAL_DIGIT_NUMBER | Character.LETTER_NUMBER |
           Character.OTHER_NUMBER |
           Character.CONNECTOR_PUNCTUATION | Character.DASH_PUNCTUATION |
           Character.START_PUNCTUATION | Character.END_PUNCTUATION |
           Character.INITIAL_QUOTE_PUNCTUATION |
           Character.FINAL_QUOTE_PUNCTUATION | Character.OTHER_PUNCTUATION |
           Character.MATH_SYMBOL | Character.CURRENCY_SYMBOL |
           Character.MODIFIER_SYMBOL | Character.OTHER_SYMBOL => true
      case _ => false
    }
  }
}
