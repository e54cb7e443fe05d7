package graft.functions

import graft.SparkTestBase
import graft.dedup.Dedup.WordShingles
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, InterpretedUnsafeProjection, UnsafeProjection}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Pins EvalMemo's value-aliasing contract: the memo returns the SAME
  * cached object for back-to-back duplicate inputs (that is the whole
  * point), so safety depends on Catalyst copying the value into its own
  * buffer at every projection boundary. If a future Spark upgrade ever
  * stopped copying, a later row's memo-evicting evaluation would mutate
  * an earlier row's output — these tests would then fail loudly instead
  * of silently corrupting results.
  */
class EvalMemoSpec extends SparkTestBase {
  import spark.implicits._

  private def utf8Row(s: String) = InternalRow(UTF8String.fromString(s))
  private val expr = WordShingles(BoundReference(0, StringType, nullable = true), 2)

  test("memo returns the identical cached object on a duplicate input (codegen entry point)") {
    // evalInput is exactly what doGenCode emits — reference equality proves
    // the generated code goes through the memo, not a fresh compute()
    val a = expr.evalInput(UTF8String.fromString("m1 m2 m3"))
    val b = expr.evalInput(UTF8String.fromString("m1 m2 m3"))
    assert(a eq b, "duplicate adjacent input must hit the single-entry memo")
    val c = expr.evalInput(UTF8String.fromString("other words here"))
    assert(!(a eq c))
  }

  test("codegen'd unsafe projection copies the memoized value (later rows can't mutate earlier output)") {
    val proj = UnsafeProjection.create(Seq(expr))
    val first = proj(utf8Row("a b c")).copy()
    proj(utf8Row("a b c"))   // memo hit: same cached ArrayData instance
    proj(utf8Row("x y z w")) // memo evict: cache now holds different spans
    val arr = first.getArray(0)
    assert((0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
      == Seq("a b", "b c"),
      "projection output must own its bytes, not alias the memo slot")
  }

  test("interpreted unsafe projection copies the memoized value too") {
    val proj = InterpretedUnsafeProjection.createProjection(Seq(expr))
    val first = proj(utf8Row("p q r")).copy()
    proj(utf8Row("p q r"))
    proj(utf8Row("s t u v"))
    val arr = first.getArray(0)
    assert((0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
      == Seq("p q", "q r"))
  }

  test("adjacent duplicate rows through a real plan stay independent") {
    // the DataFrame path: duplicates sorted adjacent within one partition,
    // shingled under whole-stage codegen, results must be per-row correct
    val texts = Seq("d1 d2 d3", "d1 d2 d3", "e1 e2 e3", "d1 d2 d3", "e1 e2 e3")
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").coalesce(1).sortWithinPartitions("text")
      .select($"text", graft.dedup.Dedup.shingles($"text", 2).as("sh"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq)
    for ((t, sh) <- got)
      assert(sh == t.split(" ").sliding(2).map(_.mkString(" ")).toSeq, s"text '$t'")
  }
}
