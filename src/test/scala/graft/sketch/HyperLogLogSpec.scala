package graft.sketch

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HyperLogLogSpec extends SparkTestBase {
  import spark.implicits._

  private def regs(df: org.apache.spark.sql.DataFrame, p: Int): Array[Int] =
    df.agg(HyperLogLog.sketch(col("w"), p)).head.getSeq[Int](0).toArray

  test("registers: distributed fold equals a local replay; duplicates are idempotent") {
    val terms = (1 to 2000).map(i => s"term$i")
    val withDups = terms ++ terms.take(500) ++ terms.take(100)
    val df = spark.createDataset(withDups).toDF("w").repartition(8)
    val got = regs(df, 8)
    val local = new Array[Int](256)
    terms.foreach { t =>
      val (j, r) = HyperLogLog.bucketRank(CountMin.baseHash(t.getBytes("UTF-8")), 256)
      if (r > local(j)) local(j) = r
    }
    assert(got.toSeq == local.toSeq) // dups cannot move a max
    assert(got.sum > 0)
  }

  test("estimate accuracy: within ~15% over two decades of cardinality") {
    for (n <- Seq(100, 1000, 20000)) {
      val df = spark.createDataset((1 to n).map(i => s"val$i")).toDF("w")
      val est = HyperLogLog.estimate(regs(df, 8))
      val err = math.abs(est - n) / n
      assert(err < 0.15, s"n=$n est=$est err=$err")
    }
  }

  test("sketches merge: element-wise max of two corpus sketches == sketch of the union") {
    val c1 = spark.createDataset((1 to 800).map(i => s"a$i")).toDF("w")
    val c2 = spark.createDataset((500 to 1200).map(i => s"a$i") ++ Seq("zebra")).toDF("w")
    val merged = regs(c1, 8).zip(regs(c2, 8)).map { case (x, y) => math.max(x, y) }
    assert(merged.toSeq == regs(c1.unionByName(c2), 8).toSeq)
    // and the union estimate reflects the overlap, not the sum of parts
    val est = HyperLogLog.estimate(merged)
    assert(est > 900 && est < 1600, s"union estimate $est")
  }

  test("rollup query: merged-from-group registers equal the direct global sketch") {
    val rows = graft.queries.QueriesR7c.qHllRollup(spark, "/root/testdata/sf0.001")
      .collect()
    val bySource = rows.groupBy(_.getString(0))
    val merged = bySource("__merged__").sortBy(_.getLong(1)).map(_.getInt(2)).toSeq
    val direct = bySource("__direct__").sortBy(_.getLong(1)).map(_.getInt(2)).toSeq
    assert(merged.length == 256 && merged == direct,
      "group-wise max must reproduce the one-shot union sketch")
    // and each per-source register is dominated by the merged register
    bySource.filterNot(kv => kv._1.startsWith("__")).foreach { case (_, rs) =>
      rs.foreach(r => assert(r.getInt(2) <= merged(r.getLong(1).toInt)))
    }
  }

  test("rank arithmetic: SQL bin-length replay equals numberOfLeadingZeros") {
    for (h <- Seq(0L, 1L, 7L, 255L, 536870911L, 999999999L)) {
      val (j, r) = HyperLogLog.bucketRank(h, 256)
      val v = HyperLogLog.mix(h, 2)
      val viaBin = if (v == 0) 31 else 31 - java.lang.Long.toBinaryString(v).length
      assert(r == viaBin, s"h=$h")
      assert(r >= 1 && r <= 31)
      assert(j == (HyperLogLog.mix(h, 1) % 256).toInt)
    }
    intercept[IllegalArgumentException](
      HllAgg(org.apache.spark.sql.catalyst.expressions.Literal("x"), 20))
  }
}
