package graft.sim

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AnnSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private lazy val vecs: Map[Long, Array[Double]] =
    emb.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def naiveTopK(q: Long, k: Int): Seq[Long] =
    vecs.toSeq.filter(_._1 != q)
      .map { case (id, v) => (id, cos(vecs(q), v)) }
      .sortBy { case (id, s) => (-s, id) }
      .take(k).map(_._1)

  test("bruteForceTopK equals naive exact search") {
    val got = Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    for (q <- 0L until 5L)
      assert(got(q) == naiveTopK(q, 5), s"topk mismatch for query $q")
  }

  test("ivfTopK achieves usable recall vs brute force") {
    val got = Ann.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
        nlist = 16, nprobe = 4)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = (0L until 10L).map { q =>
      val truth = naiveTopK(q, 5).toSet
      got.getOrElse(q, Set.empty).count(truth) / 5.0
    }
    val meanRecall = recalls.sum / recalls.size
    // deterministic for this dataset; IVF with 1/4 of cells probed
    assert(meanRecall >= 0.5, s"mean recall@5 = $meanRecall")
  }

  test("lshNearDupPairs is a sound subset of brute-force pairs") {
    val brute = (for {
      (a, va) <- vecs.toSeq; (b, vb) <- vecs.toSeq if a < b
      s = cos(va, vb) if s >= 0.4
    } yield (a, b)).toSet
    val got = Ann.lshNearDupPairs(emb, threshold = 0.4, dim = 64, nbits = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(brute), "LSH must never emit a below-threshold pair")
    if (brute.nonEmpty) {
      val recall = got.size.toDouble / brute.size
      assert(recall > 0.0, "LSH should recover at least some true pairs")
    }
  }

  test("lshNearDupPairs finds every rescaled duplicate with a bucket equi-join (no cartesian)") {
    // a positively scaled copy has identical hyperplane sign bits, so
    // recall on scaled-duplicate pairs is exact by construction
    val corpus = graft.queries.QueriesML.embedDedupCorpus(spark, dir)
    val pairs = Ann.lshNearDupPairs(corpus, threshold = 0.99, dim = 64, nbits = 8)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "LSH near-dup must be a bucket equi-join, not an all-pairs plan")
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = vecs.keys.filter(_ % 5 == 0).map(id => (id, id + 100000L)).toSet
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size} planted duplicates")
  }

  test("CosineSim expression equals the local loop") {
    val got = Ann.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), k = 3)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    for ((id, s) <- got) {
      val want = math.rint(cos(vecs(0L), vecs(id)) * 10000) / 10000
      assert(math.abs(s - want) < 1e-9)
    }
  }
}
