package graft.functions

import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Canonical wire-format encoder — the reference's `Event.Bytes()`
  * (`lc-lib/event/event.go:346-361`): one JSON object per event with the
  * dynamic fields merged at TOP LEVEL (not nested), `@metadata` never
  * serialised (callers strip `_meta*` columns first / we skip them here),
  * and the FloatValue rule — float-typed values always render with a
  * decimal point (`lc-lib/event/float_value.go:8-26`).
  *
  * Input: a struct of the envelope columns; any `MapType(String,String)`
  * member is inlined at top level, `_meta`-prefixed members are skipped,
  * everything else renders by type (timestamps as RFC3339, the
  * `@timestamp` shape `timestamp.go:34-46`).
  */
case class EventJsonEncode(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "event_json"
  override val dataType: DataType = StringType

  // resolved lazily — the child struct is unresolved at construction
  @transient private lazy val structType = child.dataType.asInstanceOf[StructType]

  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val node = JsonFlatten.mapper.createObjectNode()
    var i = 0
    while (i < structType.fields.length) {
      val f = structType.fields(i)
      if (!f.name.startsWith("_meta") && !row.isNullAt(i)) put(node, f, row, i)
      i += 1
    }
    UTF8String.fromString(node.toString)
  }

  private def put(node: ObjectNode, f: StructField, row: InternalRow, i: Int): Unit =
    f.dataType match {
      case StringType => node.put(f.name, row.getUTF8String(i).toString)
      case IntegerType => node.put(f.name, row.getInt(i))
      case LongType => node.put(f.name, row.getLong(i))
      case BooleanType => node.put(f.name, row.getBoolean(i))
      case DoubleType | FloatType =>
        // FloatValue rule: always a decimal point
        val d = f.dataType match {
          case DoubleType => row.getDouble(i)
          case _ => row.getFloat(i).toDouble
        }
        node.put(f.name, d)
      case TimestampType =>
        val micros = row.getLong(i)
        node.put(f.name,
          java.time.Instant.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            Math.floorMod(micros, 1000000L) * 1000L).toString)
      case MapType(StringType, StringType, _) =>
        val m = row.getMap(i).asInstanceOf[MapData]
        val keys = m.keyArray(); val vals = m.valueArray()
        var j = 0
        while (j < m.numElements()) {
          node.put(keys.getUTF8String(j).toString, vals.getUTF8String(j).toString)
          j += 1
        }
      case ArrayType(StringType, _) =>
        val arr = row.getArray(i)
        val jarr = node.putArray(f.name)
        var j = 0
        while (j < arr.numElements()) { jarr.add(arr.getUTF8String(j).toString); j += 1 }
      case other =>
        throw new UnsupportedOperationException(s"event_json: $other (${f.name})")
    }

  def evalInput(s: Any): AnyRef = nullSafeEval(s).asInstanceOf[AnyRef]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("eventJson", this, classOf[EventJsonEncode].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.evalInput($c);")
  }

  override protected def withNewChildInternal(c: Expression): EventJsonEncode =
    copy(child = c)
}

object EventJsonEncode {
  def apply(c: Column): Column = EU.column(EventJsonEncode(EU.expression(c)))

  /** Encode a whole envelope frame: every column except `_meta*`. */
  def forFrame(df: DataFrame): Column =
    apply(struct(df.columns.filterNot(_.startsWith("_meta")).map(col).toSeq: _*))
}
