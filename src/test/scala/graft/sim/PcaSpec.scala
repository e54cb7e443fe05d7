package graft.sim

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  private def naiveGram(vecs: Seq[Seq[Double]], dim: Int, scale: Long): Array[Long] = {
    val g = new Array[Long](dim * dim)
    vecs.foreach { v =>
      val q = v.take(dim).map(x => math.floor(x * scale).toLong)
      for (i <- q.indices; j <- q.indices) g(i * dim + j) += q(i) * q(j)
    }
    g
  }

  test("gram aggregate equals the naive per-row outer-product sum") {
    val vecs = Seq.tabulate(40)(i => Seq.tabulate(5)(d => math.sin(i * 3 + d) * 0.7))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val g = Pca.gram(df, "embedding", dim = 5)
    // quantization happens on the float->double widened values, so the
    // reference must quantize the same widened doubles
    val widened = vecs.map(_.map(x => x.toFloat.toDouble))
    assert(g.toSeq == naiveGram(widened, 5, 10000L).toSeq)
  }

  test("shard grams add: gram(A ++ B) == gram(A) + gram(B)") {
    val a = Seq.tabulate(20)(i => (i.toLong, Seq.tabulate(4)(d => math.cos(i + d).toFloat)))
    val b = Seq.tabulate(20)(i => ((i + 100).toLong, Seq.tabulate(4)(d => math.sin(i * 2 + d).toFloat)))
    val ga = Pca.gram(a.toDF("vec_id", "embedding"), "embedding", dim = 4)
    val gb = Pca.gram(b.toDF("vec_id", "embedding"), "embedding", dim = 4)
    val gab = Pca.gram((a ++ b).toDF("vec_id", "embedding"), "embedding", dim = 4)
    assert(gab.toSeq == ga.zip(gb).map { case (x, y) => x + y }.toSeq)
  }

  test("power iteration finds a dominant axis-aligned direction") {
    // corpus dominated by the first axis: variance along dim 0 is ~100×
    // the off-axis variance
    val vecs = Seq.tabulate(50)(i =>
      (i.toLong, Seq((if (i % 2 == 0) 1.0f else -1.0f) * (0.8f + (i % 5) * 0.01f),
        0.01f * (i % 7 - 3), 0.02f * (i % 3 - 1))))
    val df = vecs.toDF("vec_id", "embedding")
    val g = Pca.gram(df, "embedding", dim = 3)
    val v = Pca.dominantDirection(g, dim = 3, iters = 8)
    assert(math.abs(v(0)) == 10000L, s"dominant component pinned to scale: ${v.toSeq}")
    assert(math.abs(v(1)) < 1000L && math.abs(v(2)) < 1000L,
      s"off-axis components small: ${v.toSeq}")
  }

  test("projection expression equals the driver-side exact dot") {
    val vecs = Seq.tabulate(30)(i => (i.toLong, Seq.tabulate(6)(d => math.sin(i * 5 + d).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val w = Array(10000L, -3517L, 42L, 0L, 9999L, -10000L)
    val got = df.select(col("vec_id"), Pca.project(col("embedding"), w).as("p"))
      .as[(Long, Long)].collect().toMap
    vecs.foreach { case (id, v) =>
      val expect = v.zip(w).map { case (x, wi) =>
        math.floor(x.toDouble * 10000L).toLong * wi }.sum
      assert(got(id) == expect, s"vec $id")
    }
  }

  test("residual is EXACTLY integer-orthogonal to the removed direction") {
    val vecs = Seq.tabulate(30)(i => (i.toLong, Seq.tabulate(6)(d => math.sin(i * 5 + d).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val g = Pca.gram(df, "embedding", dim = 6)
    val w = Pca.dominantDirection(g, dim = 6, iters = 8)
    val rows = df.select(col("vec_id"),
        Pca.removeDominant(col("embedding"), w).as("r"))
      .as[(Long, Seq[Long])].collect()
    assert(rows.length == 30)
    rows.foreach { case (id, r) =>
      val dot = r.zip(w).map { case (ri, wi) => BigInt(ri) * wi }.sum
      assert(dot == 0, s"vec $id: residual·w = $dot (must be exactly 0)")
      // and the residual matches the cross-multiplied definition
      val q = vecs(id.toInt)._2.map(x => math.floor(x.toDouble * 10000L).toLong)
      val proj = q.zip(w).map { case (qi, wi) => qi * wi }.sum
      val wn = w.map(x => x * x).sum
      assert(r == q.zip(w).map { case (qi, wi) => qi * wn - proj * wi })
    }
  }

  test("q_pca_project executes with codegen fallback DISABLED") {
    val conf = spark.conf
    val oldFallback = conf.get("spark.sql.codegen.fallback", "true")
    val oldFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      assert(graft.queries.QueriesR7c.qPcaProject(spark, "/root/testdata/sf0.001").count() > 0)
    } finally {
      conf.set("spark.sql.codegen.fallback", oldFallback)
      conf.set("spark.sql.codegen.factoryMode", oldFactory)
    }
  }

  test("projection pass plan: zero exchanges (parquet-backed)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val g = Pca.gram(emb, "embedding", dim = 64)
    val v = Pca.dominantDirection(g, dim = 64, iters = 6)
    val plan = emb.select(col("vec_id"), Pca.project(col("embedding"), v).as("proj"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    assert(plan.contains("int_dot"))
  }
}
