package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression — the
  * canonical-composition pass every text-ingest pipeline needs before
  * hashing/dedup (the same visible text in composed vs decomposed form
  * would otherwise carry different md5s through the whole dedup family).
  * Spark has no built-in; a UDF would break whole-stage codegen.
  *
  * Two-tier fast path: (1) `isFullAscii` — one branch-free byte scan,
  * ZERO allocation — returns the input UTF8String untouched (ASCII is
  * closed under NFC), covering the bulk of log/telemetry text; (2) for
  * non-ASCII rows, `Normalizer.isNormalized` skips the normalize+
  * re-encode copies when the text is already composed — the common case
  * on real corpora — though this tier still pays the one UTF8String →
  * java.lang.String decode that `isNormalized` needs. Only text that
  * actually recomposes pays the full normalize + encode.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"
  override val dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    if (u.isFullAscii) return u
    val s = u.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  def evalInput(s: Any): AnyRef = nullSafeEval(s).asInstanceOf[AnyRef]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfc", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.evalInput($c);")
  }

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

object NfcNormalize {
  def apply(c: Column): Column = EU.column(NfcNormalize(EU.expression(c)))
}
