package graft.sketch

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  test("one-sided error: estimates NEVER undercount, and match exact counts absent collisions") {
    val d = 4; val w = 256
    val words = (1 to 50).flatMap(i => Seq.fill(i)(s"term$i"))
    val df = spark.createDataset(words).toDF("w").repartition(8)
    val sk = df.agg(CountMin.sketch(col("w"), d, w)).head.getSeq[Long](0).toArray
    assert(sk.length == d * w)
    // each of the d rows holds every increment exactly once
    (0 until d).foreach { i =>
      assert(sk.slice(i * w, (i + 1) * w).sum == words.length)
    }
    val est = df.distinct()
      .select(col("w"), CountMin.estimate(col("w"), sk, d, w).as("e"))
      .as[(String, Long)].collect().toMap
    (1 to 50).foreach { i =>
      val t = est(s"term$i")
      assert(t >= i, s"CMS undercounted term$i: $t < $i")
    }
    // 50 terms in 256 buckets: SOME row of the 4 is collision-free for
    // most terms, so most estimates are exact — sanity, not a contract
    assert((1 to 50).count(i => est(s"term$i") == i) >= 25)
  }

  test("sketches merge: sum of two corpus sketches == sketch of the union") {
    val d = 3; val w = 64
    val c1 = spark.createDataset(Seq("a", "b", "a")).toDF("w")
    val c2 = spark.createDataset(Seq("b", "c")).toDF("w")
    def sk(df: org.apache.spark.sql.DataFrame): Array[Long] =
      df.agg(CountMin.sketch(col("w"), d, w)).head.getSeq[Long](0).toArray
    val merged = sk(c1).zip(sk(c2)).map { case (x, y) => x + y }
    assert(merged.toSeq == sk(c1.unionByName(c2)).toSeq)
  }

  test("SQL-spelled estimate hash equals the JVM byte fold for ASCII terms") {
    val terms = Seq("a", "zebra", "xylophone", "qqqqqqqqqqqqqqqqqqqq")
    terms.foreach { t =>
      val h = CountMin.baseHash(t.getBytes("UTF-8"))
      assert(h >= 0 && h < CountMin.P)
      // plant a known count at each of the term's buckets and read it back
      val d = 2; val w = 32
      val sk = new Array[Long](d * w)
      (0 until d).foreach(i => sk(i * w + CountMin.bucket(h, i, w)) = 42L)
      val got = spark.createDataset(Seq(t)).toDF("w")
        .select(CountMin.estimate(col("w"), sk, d, w)).head.getLong(0)
      assert(got == 42L, s"hash mismatch for '$t'")
    }
  }

  test("lattice ceiling and type contracts fail loudly") {
    intercept[IllegalArgumentException](
      CountMinAgg(org.apache.spark.sql.catalyst.expressions.Literal("x"), 16, 1 << 17))
    intercept[IllegalArgumentException](CountMin.estimate(col("w"), new Array[Long](7), 2, 4))
  }
}
