package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Byte-exact truncation/chunking — the reference counts BYTES, not
  * characters (`lc-lib/harvester/linereader.go:76-149` max line bytes;
  * `lc-lib/codecs/multiline/multiline.go:199-223` max multiline bytes).
  * A `substring` spelling silently diverges on multi-byte UTF-8 text.
  *
  * Divergence (documented): where the reference may split mid-rune (Go
  * strings are raw bytes), we back off up to 3 bytes to the last complete
  * code point so every output remains valid UTF-8 — a JVM/Catalyst string
  * must be. ASCII behaviour is identical. Property-tested with multi-byte
  * inputs in ByteTruncSpec.
  */
object ByteTrunc {

  /** Largest rune-complete prefix length ≤ maxBytes (in bytes). */
  def safeCut(base: AnyRef, offset: Long, n: Int, maxBytes: Int): Int = {
    if (n <= maxBytes) return n
    var cut = maxBytes
    // back off while the byte AT the cut is a UTF-8 continuation byte
    while (cut > 0 && (Platform.getByte(base, offset + cut) & 0xC0) == 0x80) cut -= 1
    cut
  }

  private[functions] def slice(s: UTF8String, start: Int, len: Int): UTF8String = {
    val bytes = new Array[Byte](len)
    Platform.copyMemory(s.getBaseObject, s.getBaseOffset + start,
      bytes, Platform.BYTE_ARRAY_OFFSET, len)
    UTF8String.fromBytes(bytes)
  }
}

/** Truncate to at most `maxBytes` UTF-8 bytes (rune-safe). */
case class Utf8TruncBytes(child: Expression, maxBytes: Int) extends UnaryExpression {
  require(maxBytes >= 0)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "utf8_trunc_bytes"
  override val dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    if (n <= maxBytes) s
    else ByteTrunc.slice(s, 0, ByteTrunc.safeCut(s.getBaseObject, s.getBaseOffset, n, maxBytes))
  }

  def evalInput(s: Any): AnyRef = nullSafeEval(s).asInstanceOf[AnyRef]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("trunc", this, classOf[Utf8TruncBytes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.evalInput($c);")
  }

  override protected def withNewChildInternal(c: Expression): Utf8TruncBytes =
    copy(child = c)
}

object Utf8TruncBytes {
  def apply(c: Column, maxBytes: Int): Column =
    EU.column(Utf8TruncBytes(EU.expression(c), maxBytes))
}

/** Split into chunks of at most `maxBytes` UTF-8 bytes each (rune-safe
  * back-off per cut; cumulative — each chunk starts where the previous
  * cut landed, mirroring the reference's carry-over,
  * `multiline.go:199-223`). A trailing EMPTY chunk is emitted when the
  * final cut consumed exactly `maxBytes` (including the empty input): the
  * reference's cut loop leaves a zero-length remainder in the buffer
  * which flushes as an empty event (`multiline.go:245-248`).
  */
case class Utf8ChunkBytes(child: Expression, maxBytes: Int) extends UnaryExpression {
  require(maxBytes > 0)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "utf8_chunk_bytes"
  override val dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n / maxBytes + 1)
    var start = 0
    var lastLen = -1
    while (start < n) {
      val remaining = n - start
      var len =
        if (remaining <= maxBytes) remaining
        else ByteTrunc.safeCut(s.getBaseObject, s.getBaseOffset + start, remaining, maxBytes)
      if (len == 0) {
        // oversized rune (max < 4 pathology): forced progress by one
        // whole code point — never emit invalid UTF-8
        val lead = Platform.getByte(s.getBaseObject, s.getBaseOffset + start) & 0xFF
        len = math.min(remaining,
          if (lead < 0xC0) 1 else if (lead < 0xE0) 2 else if (lead < 0xF0) 3 else 4)
      }
      out += ByteTrunc.slice(s, start, len)
      lastLen = len
      start += len
    }
    if (lastLen == maxBytes || n == 0) out += UTF8String.EMPTY_UTF8
    new GenericArrayData(out.toArray)
  }

  def evalInput(s: Any): AnyRef = nullSafeEval(s).asInstanceOf[AnyRef]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("chunk", this, classOf[Utf8ChunkBytes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalInput($c);")
  }

  override protected def withNewChildInternal(c: Expression): Utf8ChunkBytes =
    copy(child = c)
}

object Utf8ChunkBytes {
  def apply(c: Column, maxBytes: Int): Column =
    EU.column(Utf8ChunkBytes(EU.expression(c), maxBytes))
}
