package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BoundedCollectSpec extends SparkTestBase {
  import spark.implicits._

  test("groups within the cap yield the full value set; over-cap groups yield NULL") {
    // key "hot" has 5 values (> limit 3) → NULL; "warm" exactly 3; "cold" 1
    val df = (Seq.tabulate(5)(i => ("hot", i.toLong)) ++
        Seq(("warm", 10L), ("warm", 11L), ("warm", 12L), ("cold", 99L)))
      .toDF("k", "v")
      .repartition(8, col("v")) // spread each group across partitions → merge path
    val got = df.groupBy("k").agg(BoundedCollectList(col("v"), 3).as("vs"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1).sorted)).toMap
    assert(got("hot") == null, "saturated group must collapse to NULL")
    assert(got("warm") == Seq(10L, 11L, 12L))
    assert(got("cold") == Seq(99L))
  }

  test("string values survive the serialize/merge path (buffer-reuse copy)") {
    val df = (1 to 40).map(i => (s"k${i % 7}", s"value_$i"))
      .toDF("k", "v").repartition(16, col("v"))
    val got = df.groupBy("k").agg(BoundedCollectList(col("v"), 10).as("vs"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) Set.empty[String] else r.getSeq[String](1).toSet)).toMap
    val want = (1 to 40).groupBy(i => s"k${i % 7}")
      .view.mapValues(is => if (is.size > 10) Set.empty[String]
                            else is.map(i => s"value_$i").toSet).toMap
    assert(got == want)
  }

  test("limit 1 keeps only singleton groups; NULL inputs are skipped like collect_list") {
    val df = Seq(("a", Some(1L)), ("a", None), ("b", Some(2L)), ("b", Some(3L)))
      .toDF("k", "v")
    val got = df.groupBy("k").agg(BoundedCollectList(col("v"), 1).as("vs"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(got("a") == Seq(1L), "the NULL row must not count toward the cap")
    assert(got("b") == null)
  }
}
