package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType}

/** `collect_list` with a hard per-key cap: keeps at most `limit` values per
  * group and yields NULL for any group that exceeds it.
  *
  * This is the memory-safe way to build capped posting lists in ONE pass:
  * a plain `collect_list` → `filter(size <= limit)` materializes the full
  * list for hot keys *before* the filter (a shingle appearing in 10⁸ docs
  * = a 10⁸-element buffer on one executor), while the usual alternative —
  * count per key, anti-join the hot keys out, then join/collect — costs an
  * extra scan plus an extra shuffle. Here the buffer saturates: once a
  * group passes `limit` it is marked overflowed and its values are freed,
  * so per-key memory is O(limit) no matter how hot the key, in both the
  * partial (map-side) and final aggregation.
  *
  * Element order within a kept list is not deterministic (like
  * `collect_list`); callers must use it as a set.
  */
case class BoundedCollectList(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedCollectList.Buffer]
  with UnaryLike[Expression] {

  require(limit >= 1, "bounded_collect limit must be >= 1")

  override def prettyName: String = "bounded_collect"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def createAggregationBuffer(): BoundedCollectList.Buffer =
    new BoundedCollectList.Buffer(false, new ArrayBuffer[Any](8))

  override def update(buf: BoundedCollectList.Buffer, input: InternalRow): BoundedCollectList.Buffer = {
    if (!buf.overflowed) {
      val v = child.eval(input)
      if (v != null) {
        // values may point into a reused row buffer (UTF8String spans)
        buf.values += InternalRow.copyValue(v)
        if (buf.values.length > limit) buf.saturate()
      }
    }
    buf
  }

  override def merge(buf: BoundedCollectList.Buffer, other: BoundedCollectList.Buffer): BoundedCollectList.Buffer = {
    if (other.overflowed) buf.saturate()
    else if (!buf.overflowed) {
      buf.values ++= other.values
      if (buf.values.length > limit) buf.saturate()
    }
    buf
  }

  override def eval(buf: BoundedCollectList.Buffer): Any =
    if (buf.overflowed) null else new GenericArrayData(buf.values.toArray)

  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](BooleanType, dataType))

  override def serialize(buf: BoundedCollectList.Buffer): Array[Byte] = {
    val arr = if (buf.overflowed) new GenericArrayData(Array.empty[Any])
              else new GenericArrayData(buf.values.toArray)
    serProj(InternalRow(buf.overflowed, arr)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): BoundedCollectList.Buffer = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val overflowed = row.getBoolean(0)
    val out = new ArrayBuffer[Any](8)
    if (!overflowed) {
      val arr = row.getArray(1)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        out += InternalRow.copyValue(arr.get(i, child.dataType))
        i += 1
      }
    }
    new BoundedCollectList.Buffer(overflowed, out)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): BoundedCollectList =
    copy(child = c)
}

object BoundedCollectList {
  final class Buffer(var overflowed: Boolean, val values: ArrayBuffer[Any]) {
    def saturate(): Unit = { overflowed = true; values.clear() }
  }

  /** Column form: `bounded_collect(c, limit)` — array of the group's values,
    * or NULL if the group holds more than `limit` of them.
    */
  def apply(c: Column, limit: Int): Column =
    EU.column(new BoundedCollectList(EU.expression(c), limit).toAggregateExpression())
}
