package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Tag-set invariants (`lc-lib/event/event.go:300-334`): sorted, unique,
  * capped at 1024, binary-search insert; remove preserves order.
  * Property-tested against the plain Scala model via direct expression
  * eval (no Spark jobs).
  */
class TagSetSpec extends AnyFunSuite {

  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p).passed)

  private val tagGen = Gen.listOf(Gen.oneOf(
    Gen.choose('a', 'z').map(_.toString),
    Gen.identifier.map(_.take(6)),
    Gen.oneOf("err", "big", "seen", "_grok_failure", "nginx")))

  private def insert(tags: Seq[String], t: String): Seq[String] = {
    val arr = SortedTagInsert(
      Literal.create(tags, ArrayType(StringType)),
      Literal(UTF8String.fromString(t), StringType)
    ).eval(null).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("property: sequential inserts equal sorted-distinct of the inserted set") {
    check(Prop.forAll(tagGen) { tags =>
      tags.foldLeft(Seq.empty[String])(insert) == tags.distinct.sorted
    })
  }

  test("property: every intermediate state stays sorted and unique") {
    check(Prop.forAll(tagGen) { tags =>
      val states = tags.scanLeft(Seq.empty[String])(insert)
      states.forall(s => s == s.distinct.sorted)
    })
  }

  test("cap at 1024 entries (event.go:307): the 1025th distinct insert is dropped") {
    val initial = (0 until 1024).map(i => f"t$i%05d")
    assert(insert(initial, "zzzzz") == initial) // full: new tag rejected
    assert(insert(initial, "t00000") == initial) // present: no-op, no error
    val of1023 = initial.take(1023)
    assert(insert(of1023, "zzzzz").size == 1024) // room for one more
  }
}
