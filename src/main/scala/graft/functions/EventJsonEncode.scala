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
      case DoubleType =>
        // FloatValue rule (`float_value.go:8-26`): always a decimal
        // point, and Go strconv.FormatFloat('f', -1) plain notation —
        // Jackson's default would render 1e10 as "1.0E10"
        node.putRawValue(f.name, new com.fasterxml.jackson.databind.util.RawValue(
          EventJsonEncode.goFloatString(row.getDouble(i))))
      case FloatType =>
        // FloatValue32 uses strconv.FormatFloat(..., 32): 32-bit shortest
        // digits. Widening to double first renders 0.1f as
        // "0.10000000149011612" — every non-dyadic float would diverge
        node.putRawValue(f.name, new com.fasterxml.jackson.databind.util.RawValue(
          EventJsonEncode.goFloat32String(row.getFloat(i))))
      case TimestampType =>
        // RFC3339Nano shape (`timestamp.go:34-46`): fraction trimmed of
        // trailing zeros, no padding (Instant.toString pads to 3/6/9)
        node.put(f.name, EventJsonEncode.rfc3339Nano(row.getLong(i)))
      case MapType(StringType, StringType, _) =>
        val m = row.getMap(i).asInstanceOf[MapData]
        val keys = m.keyArray(); val vals = m.valueArray()
        var j = 0
        while (j < m.numElements()) {
          val k = keys.getUTF8String(j).toString
          // valueContainsNull maps: Go json.Marshal renders nil as null
          if (vals.isNullAt(j)) node.putNull(k)
          else node.put(k, vals.getUTF8String(j).toString)
          j += 1
        }
      case st: StructType =>
        // nested object — the ECS envelope shape (host.name, log.file.path)
        val child = row.getStruct(i, st.fields.length)
        val childNode = node.putObject(f.name)
        var j = 0
        while (j < st.fields.length) {
          if (!child.isNullAt(j)) put(childNode, st.fields(j), child, j)
          else childNode.putNull(st.fields(j).name)
          j += 1
        }
      case ArrayType(elem, _) =>
        val arr = row.getArray(i)
        val jarr = node.putArray(f.name)
        var j = 0
        while (j < arr.numElements()) {
          // element nulls: the map and struct branches check them; an
          // unchecked array slot NPE'd on strings and silently encoded
          // numeric nulls as 0 — JSON null is the faithful wire form
          if (arr.isNullAt(j)) jarr.addNull()
          else elem match {
            case StringType => jarr.add(arr.getUTF8String(j).toString)
            case LongType => jarr.add(arr.getLong(j))
            case IntegerType => jarr.add(arr.getInt(j))
            case DoubleType => jarr.addRawValue(
              new com.fasterxml.jackson.databind.util.RawValue(
                EventJsonEncode.goFloatString(arr.getDouble(j))))
            case FloatType => jarr.addRawValue(
              new com.fasterxml.jackson.databind.util.RawValue(
                EventJsonEncode.goFloat32String(arr.getFloat(j))))
            case BooleanType => jarr.add(arr.getBoolean(j))
            case other =>
              throw new UnsupportedOperationException(s"event_json array: $other (${f.name})")
          }
          j += 1
        }
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

/** Go-style JSON rendering of a double for pattern substitution
  * (`pattern.go:90-96` json.Marshal + the FloatValue decimal-point rule).
  */
case class GoFloatJson(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "go_float_json"
  override val dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(EventJsonEncode.goFloatString(input.asInstanceOf[Double]))
  def evalInput(s: Any): AnyRef = nullSafeEval(s).asInstanceOf[AnyRef]
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("goFloat", this, classOf[GoFloatJson].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.evalInput($c);")
  }
  override protected def withNewChildInternal(c: Expression): GoFloatJson =
    copy(child = c)
}

object GoFloatJson {
  def apply(c: Column): Column = EU.column(GoFloatJson(EU.expression(c)))
}

object EventJsonEncode {
  def apply(c: Column): Column = EU.column(EventJsonEncode(EU.expression(c)))

  /** Go `strconv.FormatFloat(d, 'f', -1, 64)` + the FloatValue
    * always-a-decimal-point rule: shortest round-trip digits, plain
    * (never scientific) notation, `.0` appended to integral values.
    */
  def goFloatString(d: Double): String = {
    if (d.isNaN || d.isInfinite)
      // Go json.Marshal errors on these; render the Java spelling rather
      // than throw (documented divergence — no error channel in a column)
      return java.lang.Double.toString(d)
    if (d == 0.0d)
      return if (1.0 / d < 0) "-0.0" else "0.0"
    // Double.toString yields the shortest round-trip digits; BigDecimal
    // re-renders them in plain notation
    val plain = new java.math.BigDecimal(java.lang.Double.toString(d))
      .stripTrailingZeros().toPlainString()
    if (plain.indexOf('.') >= 0) plain else plain + ".0"
  }

  /** Go `strconv.FormatFloat(f, 'f', -1, 32)` — 32-bit shortest
    * round-trip digits (FloatValue32, `float_value.go`). Java's
    * `Float.toString` gives exactly float-shortest digits; BigDecimal
    * re-renders them in plain (never scientific) notation.
    */
  def goFloat32String(f: Float): String = {
    if (java.lang.Float.isNaN(f) || java.lang.Float.isInfinite(f))
      return java.lang.Float.toString(f)
    if (f == 0.0f)
      return if (1.0f / f < 0) "-0.0" else "0.0"
    val plain = new java.math.BigDecimal(java.lang.Float.toString(f))
      .stripTrailingZeros().toPlainString()
    if (plain.indexOf('.') >= 0) plain else plain + ".0"
  }

  /** RFC3339Nano over UTC from epoch micros: trailing zeros trimmed from
    * the fraction, fraction dropped entirely when zero.
    */
  def rfc3339Nano(micros: Long): String = {
    val secs = Math.floorDiv(micros, 1000000L)
    val frac = Math.floorMod(micros, 1000000L)
    val base = java.time.LocalDateTime.ofEpochSecond(secs, 0, java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME)
    // ISO_LOCAL_DATE_TIME omits :00 seconds; RFC3339 requires them.
    // Detect the omission STRUCTURALLY (time part "HH:mm" = 5 chars
    // after 'T') — a total-length check broke for 5-digit or negative
    // years ("+10000-...", "-0044-..."), emitting no seconds field
    val withSecs =
      if (base.length - base.lastIndexOf('T') - 1 == 5) base + ":00" else base
    if (frac == 0L) withSecs + "Z"
    else {
      var f = f"$frac%06d"
      while (f.endsWith("0")) f = f.substring(0, f.length - 1)
      withSecs + "." + f + "Z"
    }
  }

  /** Encode a whole envelope frame: every column except `_meta*`. */
  def forFrame(df: DataFrame): Column =
    apply(struct(df.columns.filterNot(_.startsWith("_meta")).map(col).toSeq: _*))
}
