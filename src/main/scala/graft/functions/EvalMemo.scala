package graft.functions

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
  * key is cloned because UTF8String may point into a reused row buffer;
  * the cached value object is safe to return repeatedly since Catalyst
  * copies values into unsafe buffers at projection boundaries.
  */
object EvalMemo {
  final class Slot {
    var key: UTF8String = _
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
    if (slot.key != null && slot.key.equals(input)) slot.value
    else {
      val v = compute
      slot.key = input.clone()
      slot.value = v
      v
    }
  }
}
