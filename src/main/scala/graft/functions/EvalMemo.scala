package graft.functions

import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.array.ByteArrayMethods
import org.apache.spark.unsafe.types.UTF8String

/** Per-thread single-entry memo for expensive pure parse expressions.
  *
  * Catalyst's project-collapsing inlines a column into every use site, so
  * an expression like grok-extract that feeds the fields map, the failure
  * tag AND the routing predicate is re-evaluated several times per row
  * (measured 5.4× for the nginx grok in the flagship pipeline — the
  * duplicates are separate expression instances, which codegen
  * subexpression elimination does not unify). Because the duplicate
  * evaluations happen back-to-back on the same input row, a one-entry
  * thread-local cache keyed by (expression tag, input bytes) removes all
  * of them at the cost of one byte-compare.
  *
  * Safety: the memoised functions are pure (content → value); the input
  * bytes are copied into a slot-owned buffer because UTF8String may point
  * into a reused row buffer; the cached value object is safe to return
  * repeatedly since Catalyst copies values into unsafe buffers at
  * projection boundaries.
  *
  * Allocation: the key buffer is reused across rows (grow-only), so the
  * steady-state per-miss cost is one memcpy and zero garbage — the
  * previous `input.clone()` spelling allocated a fresh byte[] + wrapper
  * per row, which showed up as GC pressure on the multi-core bench legs.
  */
object EvalMemo {
  final class Slot {
    var buf: Array[Byte] = new Array[Byte](64)
    var len: Int = -1 // -1 = empty
    var value: Any = _
  }

  private val tl: ThreadLocal[java.util.HashMap[AnyRef, Slot]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[AnyRef, Slot]())

  /** @param tag identity of the logical function — shared across duplicate
    *            expression instances (e.g. the compiled pattern string)
    */
  def memo(tag: AnyRef, input: UTF8String)(compute: => Any): Any = {
    val m = tl.get()
    var slot = m.get(tag)
    if (slot == null) { slot = new Slot; m.put(tag, slot) }
    val n = input.numBytes()
    if (slot.len == n && ByteArrayMethods.arrayEquals(
        input.getBaseObject, input.getBaseOffset,
        slot.buf, Platform.BYTE_ARRAY_OFFSET, n)) slot.value
    else {
      val v = compute
      if (slot.buf.length < n)
        slot.buf = new Array[Byte](math.max(n, slot.buf.length * 2))
      input.writeToMemory(slot.buf, Platform.BYTE_ARRAY_OFFSET)
      slot.len = n
      slot.value = v
      v
    }
  }
}
