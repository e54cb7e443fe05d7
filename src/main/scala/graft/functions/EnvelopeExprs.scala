package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.model.Envelope

/** Envelope-maintenance expressions with real codegen.
  *
  * The built-in spellings (`array_sort∘array_insert` with a lambda
  * comparator, `map_concat∘map_filter`) are higher-order functions, which
  * are CodegenFallback in Spark — ONE of them in a projection bars the
  * whole operator from whole-stage codegen, leaving the flagship pipeline
  * as a stack of per-operator UnsafeProjections (a full row copy each).
  * These two expressions do the same work in a single JVM pass and
  * implement `doGenCode`, letting the parse→enrich→route stage fuse.
  */

/** Sorted-unique insert of one tag, capped at [[Envelope.MaxTags]] —
  * exact `AddTag` semantics (`lc-lib/event/event.go:300-321`: binary
  * search + insert into a sorted deduplicated list).
  */
case class SortedTagInsert(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_tag_insert"
  override val dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(tagsAny: Any, tagAny: Any): Any = {
    val arr = tagsAny.asInstanceOf[ArrayData]
    val tag = tagAny.asInstanceOf[UTF8String]
    val n = arr.numElements()
    // binary search over the sorted input
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = arr.getUTF8String(mid).compareTo(tag)
      if (c == 0) return arr // already present
      else if (c < 0) lo = mid + 1
      else hi = mid
    }
    if (n >= Envelope.MaxTags) return arr // cap (event.go:307)
    val out = new Array[Any](n + 1)
    var i = 0
    while (i < lo) { out(i) = arr.getUTF8String(i); i += 1 }
    out(lo) = tag
    while (i < n) { out(i + 1) = arr.getUTF8String(i); i += 1 }
    new GenericArrayData(out)
  }

  def evalInput(a: Any, b: Any): AnyRef = nullSafeEval(a, b).asInstanceOf[AnyRef]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tagInsert", this, classOf[SortedTagInsert].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalInput($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedTagInsert =
    copy(left = l, right = r)
}

object SortedTagInsert {
  def apply(tags: Column, tag: Column): Column =
    EU.column(SortedTagInsert(EU.expression(tags), EU.expression(tag)))
}

/** Merge two string maps, right side winning on key conflicts, in one
  * pass — the `map_concat(map_filter(base, !contains(over)), over)`
  * spelling without the per-row lambda machinery.
  */
case class MapMergeLastWin(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "map_merge_last_win"
  override val dataType: DataType = MapType(StringType, StringType, valueContainsNull = false)

  override def nullSafeEval(baseAny: Any, overAny: Any): Any = {
    val base = baseAny.asInstanceOf[MapData]
    val over = overAny.asInstanceOf[MapData]
    if (base.numElements() == 0) return over
    if (over.numElements() == 0) return base
    val bk = base.keyArray(); val bv = base.valueArray()
    val ok = over.keyArray(); val ov = over.valueArray()
    val nBase = base.numElements()
    val nOver = over.numElements()
    // exact-size preallocation (was two growing ArrayBuffers per row);
    // trim only when a base key is shadowed, which is the rare case
    val keys = new Array[Any](nBase + nOver)
    val vals = new Array[Any](nBase + nOver)
    var cnt = 0
    var i = 0
    while (i < nBase) {
      val k = bk.getUTF8String(i)
      var shadowed = false
      var j = 0
      while (!shadowed && j < nOver) {
        if (ok.getUTF8String(j).equals(k)) shadowed = true
        j += 1
      }
      if (!shadowed) { keys(cnt) = k; vals(cnt) = bv.getUTF8String(i); cnt += 1 }
      i += 1
    }
    var j = 0
    while (j < nOver) { keys(cnt) = ok.getUTF8String(j); vals(cnt) = ov.getUTF8String(j); cnt += 1; j += 1 }
    if (cnt == nBase + nOver) ArrayBasedMapData(keys, vals)
    else ArrayBasedMapData(
      java.util.Arrays.copyOf(keys.asInstanceOf[Array[AnyRef]], cnt),
      java.util.Arrays.copyOf(vals.asInstanceOf[Array[AnyRef]], cnt))
  }

  def evalInput(a: Any, b: Any): AnyRef = nullSafeEval(a, b).asInstanceOf[AnyRef]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mapMerge", this, classOf[MapMergeLastWin].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.MapData) $ref.evalInput($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MapMergeLastWin =
    copy(left = l, right = r)
}

object MapMergeLastWin {
  def apply(base: Column, over: Column): Column =
    EU.column(MapMergeLastWin(EU.expression(base), EU.expression(over)))
}
