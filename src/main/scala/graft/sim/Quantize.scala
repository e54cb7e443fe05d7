package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Corpus-trained scalar int8 quantization of an embedding column — the
  * STORAGE face of a 100 TB vector corpus (FAISS's `SQ8`: 4× smaller
  * than float32, and the form the ANN candidate scans read). Training
  * is one corpus scan reduced to per-dimension `[min, max]` (the stats
  * relation is dimension-bounded — 64 rows — so the partial aggregate
  * collapses map-side and the "model" is plan state, the
  * [[NearestCells]]/[[PqCodes]] rule); encoding is a ZERO-SHUFFLE
  * whole-stage-codegen projection via this one fused expression.
  *
  * Arithmetic contract, pinned for the SQL oracle:
  * `code = floor((x - mn) / (mx - mn) * 256)` clamped to `[0, 255]`,
  * with `x`, `mn`, `mx` all exact float→double widenings — identical
  * IEEE expression order in both engines, and `floor` (unlike
  * `round`) has no half-way tie convention to diverge on. A degenerate
  * dimension (`mx == mn`) codes as 0. Elements past the trained
  * dimensionality are dropped (bounded, instead of an out-of-bounds
  * task death on a corrupt row); a missing trailing dimension simply
  * yields a shorter code row.
  *
  * Precondition (part of the determinism contract): embedding elements
  * are FINITE and non-null. A NaN element codes as 0 here (both clamp
  * comparisons false, `NaN.toInt == 0`) while a DuckDB replay's
  * `least(255, floor(NaN))` yields 255 (NaN sorts greatest there) and
  * its `string_agg` silently drops NULL codes — i.e. non-finite/null
  * elements are where the two engines' conventions part ways, so they
  * are excluded by contract rather than papered over.
  *
  * The reference has no vector surface (this is the task-mandated
  * training-data addendum); the nearest analogue is its bounded
  * fixed-width field handling in `lc-lib/event/event.go`.
  */
case class Sq8Codes(child: Expression, mins: Array[Double],
    maxs: Array[Double], asString: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(mins.length == maxs.length && mins.nonEmpty,
    s"per-dimension stats must align: ${mins.length} mins vs ${maxs.length} maxs")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_codes"
  override val dataType: DataType =
    if (asString) StringType else ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any = compute(v)

  private def codeAt(arr: ArrayData, i: Int): Int = {
    if (arr.isNullAt(i)) return 0
    val mn = mins(i); val mx = maxs(i)
    if (mx == mn) return 0
    val t = math.floor((arr.getDouble(i) - mn) / (mx - mn) * 256.0)
    if (t >= 255.0) 255 else if (t <= 0.0) 0 else t.toInt
  }

  def compute(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), mins.length)
    if (asString) {
      val sb = new java.lang.StringBuilder(n * 4)
      var i = 0
      while (i < n) {
        if (i > 0) sb.append(',')
        sb.append(codeAt(arr, i))
        i += 1
      }
      UTF8String.fromString(sb.toString)
    } else {
      val out = new Array[Int](n)
      var i = 0
      while (i < n) { out(i) = codeAt(arr, i); i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8Codes", this, classOf[Sq8Codes].getName)
    val javaType = if (asString) "UTF8String" else "ArrayData"
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = ($javaType) $ref.compute($v);")
  }

  override protected def withNewChildInternal(c: Expression): Sq8Codes =
    copy(child = c)
}

object Quantize {

  /** Per-dimension `[min, max]` over the corpus as a DataFrame
    * `(dim 0-based, mn, mx)` — one scan; the explode's partial
    * min/max aggregate collapses map-side to ≤dim rows per partition,
    * so the exchange moves a dimension-bounded relation, not the corpus.
    */
  def sq8Stats(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
      .groupBy("dim").agg(min("x").as("mn"), max("x").as("mx"))

  /** Collect the stats into plan-state arrays. The collect is bounded by
    * the embedding dimensionality (64 doubles ×2) — model state, same
    * justification as the k-means quantizer collects in [[Ann]].
    */
  def sq8Train(emb: DataFrame, vecCol: String, dim: Int): (Array[Double], Array[Double]) = {
    val mins = new Array[Double](dim)
    val maxs = new Array[Double](dim)
    sq8Stats(emb, vecCol).collect().foreach { r =>
      val d = r.getInt(0)
      // an all-NULL dimension aggregates to NULL min/max — leave it at
      // the (0,0) degenerate default (codes 0) instead of dying here
      if (d < dim && !r.isNullAt(1) && !r.isNullAt(2)) {
        mins(d) = r.getDouble(1); maxs(d) = r.getDouble(2)
      }
    }
    (mins, maxs)
  }

  /** The encode column: `array<int>` codes (production face), or the
    * comma-joined string (`asString` — the byte-exact oracle face).
    */
  def sq8(vec: Column, mins: Array[Double], maxs: Array[Double],
      asString: Boolean = false): Column =
    EU.column(Sq8Codes(EU.expression(vec.cast("array<double>")), mins, maxs, asString))
}
