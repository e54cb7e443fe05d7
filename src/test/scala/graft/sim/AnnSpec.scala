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

  test("ivfTopKTrained (k-means quantizer) beats the untrained first-nlist quantizer on clustered data") {
    // A corpus with real cluster structure, ORDERED BY CLUSTER — the
    // realistic degenerate case for the untrained quantizer (a corpus
    // sorted by source/shard hands first-nlist centroids that all live in
    // the first cluster, so probing misses every other cluster). The
    // trained quantizer recovers the true centers and probing works.
    // (On the shipped near-random embeddings there is no structure to
    // learn, and trained ≈ untrained — measured in round 5; this fixture
    // is the case training exists for.)
    val nClusters = 8; val perCluster = 50; val dim = 64
    def vec(cluster: Int, j: Int): Array[Float] = {
      val v = Array.tabulate(dim) { d =>
        // deterministic small perturbation; cos within cluster ≈ 0.99+
        val h = (cluster * 7919 + j * 104729 + d * 31) % 997
        0.05f * ((h / 997.0f) - 0.5f)
      }
      v(cluster * (dim / nClusters)) += 1.0f
      v
    }
    import spark.implicits._
    val clustered = (for {
      c <- 0 until nClusters; j <- 0 until perCluster
    } yield ((c * perCluster + j).toLong, vec(c, j)))
      .toDF("vec_id", "embedding")
    val queries = clustered.filter(col("vec_id") % perCluster === 0)
    val local: Map[Long, Array[Double]] = (for {
      c <- 0 until nClusters; j <- 0 until perCluster
    } yield (c * perCluster + j).toLong -> vec(c, j).map(_.toDouble)).toMap
    def truth(q: Long): Set[Long] =
      local.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(local(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
    def meanRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(2)).toSet).toMap
      val qids = (0 until nClusters).map(_.toLong * perCluster)
      qids.map(q => got.getOrElse(q, Set.empty).count(truth(q)) / 5.0)
        .sum / qids.size
    }
    val untrained = meanRecall(
      Ann.ivfTopK(clustered, queries, k = 5, nlist = nClusters, nprobe = 1))
    // maximin init: first-k seeding would land all k seeds in cluster 0
    // on this cluster-ordered corpus — the local optimum Lloyd's cannot
    // escape at any iteration count
    val cents = Ann.kmeansCentroids(clustered, k = nClusters, iters = 2,
      dim = dim, init = "farthest")
    val trained = meanRecall(
      Ann.ivfTopKTrained(clustered, queries, k = 5, cents, nprobe = 1))
    assert(trained >= 0.99, s"trained quantizer must recover the planted clusters, recall=$trained")
    assert(trained > untrained,
      s"trained recall $trained should beat untrained $untrained on cluster-ordered data")
    // the trained cells are balanced (one per planted cluster): max
    // occupancy == perCluster — the skew/tail-latency win at scale
    val occ = Ann.kmeansAssign(clustered, cents)
      .groupBy("cluster").count().collect().map(_.getLong(1))
    assert(occ.length == nClusters && occ.max == perCluster,
      s"cell occupancy ${occ.toSeq} should be one planted cluster per cell")
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
    // recall on scaled-duplicate pairs is exact by construction — at the
    // corpus-derived nbits (the default), not just a narrow demo width
    val corpus = graft.queries.QueriesML.embedDedupCorpus(spark, dir)
    val pairs = Ann.lshNearDupPairs(corpus, threshold = 0.99, dim = 64)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "LSH near-dup must be a bucket equi-join, not an all-pairs plan")
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = vecs.keys.filter(_ % 5 == 0).map(id => (id, id + 100000L)).toSet
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size} planted duplicates")
  }

  private def randCorpus(n: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    // deterministic pseudo-random unit-ish vectors (splitmix64 → [-1, 1))
    (0 until n).map { id =>
      (id.toLong, Array.tabulate(64)(i =>
        graft.dedup.Hashes.mix64(id.toLong * 64 + i).toDouble / Long.MaxValue.toDouble))
    }.toDF("vec_id", "embedding")
  }

  private def maxOccupancy(df: org.apache.spark.sql.DataFrame, nbits: Int): Long =
    df.select(Ann.lshBuckets(col("embedding"), dim = 64, nbits = nbits).as("b"))
      .groupBy("b").count().agg(max("count")).collect()(0).getLong(0)

  test("derived nbits keeps bucket occupancy bounded on a 10x corpus") {
    val n1 = 600; val n2 = 6000
    assert(Ann.nbitsFor(n2) > Ann.nbitsFor(n1),
      "nbits must grow with the corpus")
    val occ1 = maxOccupancy(randCorpus(n1), Ann.nbitsFor(n1))
    val occ2 = maxOccupancy(randCorpus(n2), Ann.nbitsFor(n2))
    // with nbits = ceil(log2 n)+4 the bucket space stays ~16x the corpus,
    // so max occupancy must stay O(1) instead of growing with n — this is
    // exactly the property a fixed nbits (e.g. 8 = 256 buckets) violates
    assert(occ1 <= 8, s"occupancy at n=$n1: $occ1")
    assert(occ2 <= 8, s"occupancy at n=$n2 (10x): $occ2")
    val occFixed = maxOccupancy(randCorpus(n2), 8)
    assert(occFixed > 4 * occ2,
      s"sanity: a fixed 8-bit space should crowd ($occFixed) vs derived ($occ2)")
  }

  test("maxBucketOccupancy guard drops pathological hot buckets from candidate generation") {
    import spark.implicits._
    // 50 copies of ONE direction (a degenerate hot bucket) + background
    val hot = (0 until 50).map(i =>
      (1000L + i, Array.tabulate(64)(d => (d + 1).toDouble)))
    val corpus = randCorpus(200).unionByName(hot.toDF("vec_id", "embedding"))
    val unguarded = Ann.lshNearDupPairs(corpus, threshold = 0.99, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val guarded = Ann.lshNearDupPairs(corpus, threshold = 0.99, dim = 64,
        maxBucketOccupancy = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hotPairs = (for { a <- 1000L until 1050L; b <- (a + 1) until 1050L } yield (a, b)).toSet
    assert(unguarded == hotPairs, "without the guard every hot-bucket pair verifies at cosine 1")
    assert(guarded.isEmpty, "the guard must excise the degenerate bucket before the self-join")
  }

  test("the wired occupancy guard (qEmbedNearDup default) is a no-op on the planted corpus, with no broadcast hint") {
    val corpus = graft.queries.QueriesML.embedDedupCorpus(spark, dir)
    val base = emb.count()
    val guardOff = Ann.lshNearDupPairs(corpus, threshold = 0.99, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val guarded = Ann.lshNearDupPairs(corpus, threshold = 0.99, dim = 64,
      maxBucketOccupancy = graft.queries.QueriesML.EmbedNearDupMaxOccupancy,
      knownCount = base + (base + 4) / 5)
    val hints = guarded.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty,
      "the hot-bucket anti-join must not force a broadcast (AQE decides)")
    val got = guarded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == guardOff && got.nonEmpty,
      "guard at the wired default must not change the verified result")
  }

  test("NearestCells fused argmax equals sort-based selection (sim desc, cent_id asc ties)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    val rnd = (seed: Long, n: Int) => Array.tabulate(n)(i =>
      graft.dedup.Hashes.mix64(seed * 977 + i).toDouble / Long.MaxValue.toDouble)
    val cents = Array.tabulate(16)(c => rnd(c.toLong, 8))
    val centIds = Array.tabulate(16)(c => (c * 10 + 3).toLong) // non-contiguous ids
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    for (probe <- Seq(1, 3, 16, 20); seed <- 100L to 110L) {
      val v = rnd(seed, 8)
      val expr = NearestCells(Literal.create(v.toSeq,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
        centIds, cents, probe)
      val got = expr.eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      val want = centIds.zip(cents.map(c => cos(v, c)))
        .sortBy { case (id, s) => (-s, id) }
        .take(math.min(probe, 16)).map(_._1).toSeq
      assert(got == want, s"probe=$probe seed=$seed")
    }
    // zero vector: every sim is 0.0, ties broken by ascending cent_id
    val z = NearestCells(Literal.create(Array.fill(8)(0.0).toSeq,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      centIds, cents, 4)
    assert(z.eval(null).asInstanceOf[ArrayData].toLongArray().toSeq ==
      centIds.sorted.take(4).toSeq)
  }

  test("kmeansCentroids equals a naive local spherical k-means (exact integer centroids)") {
    val k = 4; val iters = 2
    // local reference: same quantization, same argmax (sim desc, lower
    // cent on ties), same exact integer sums, same empty-cluster carry
    val ids = vecs.keys.toSeq.sorted
    val quant = ids.map(id => id -> vecs(id).map(x => math.round(x * 1000000.0))).toMap
    var cents = ids.take(k).map(quant).toArray
    def assign(id: Long, cs: Array[Array[Long]]): Int = {
      var best = -1; var bestSim = Double.NegativeInfinity
      for (c <- cs.indices) {
        val sim = cos(vecs(id), cs(c).map(_.toDouble))
        if (sim > bestSim) { bestSim = sim; best = c }
      }
      best
    }
    for (_ <- 1 to iters) {
      val next = Array.tabulate(k)(c => cents(c).clone())
      val seen = Array.fill(k)(false)
      for (id <- ids) {
        val c = assign(id, cents)
        if (!seen(c)) { java.util.Arrays.fill(next(c), 0L); seen(c) = true }
        for (d <- quant(id).indices) next(c)(d) += quant(id)(d)
      }
      cents = next
    }
    val got = Ann.kmeansCentroids(emb, k, iters, dim = 64)
    assert(got.length == k)
    for (c <- 0 until k)
      assert(got(c).toSeq == cents(c).toSeq, s"centroid $c diverged")
    // final assignment agrees too, and every cluster id is in range
    val gotAssign = Ann.kmeansAssign(emb, got)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (id <- ids)
      assert(gotAssign(id) == assign(id, cents), s"assignment for $id")
  }

  test("CosineSim expression equals the local loop") {
    val got = Ann.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), k = 3)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    for ((id, s) <- got) {
      val want = math.rint(cos(vecs(0L), vecs(id)) * 10000) / 10000
      assert(math.abs(s - want) < 1e-9)
    }
  }

  test("semDedup equals a local within-cluster reference on the planted corpus") {
    val corpus = graft.queries.QueriesML.embedDedupCorpus(spark, dir)
    val cents = Ann.kmeansCentroids(emb, k = 4, iters = 2, dim = 64)
    // local reference: take the engine's (already-tested) cluster
    // assignment as ground truth, then replay the drop rule locally
    val assigned = Ann.kmeansAssign(corpus, cents)
      .select(col("vec_id"), col("cluster"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).toArray))
    val byCluster = assigned.groupBy(_._2)
    val want = (for {
      (cl, members) <- byCluster.toSeq
      (id, _, v) <- members
      lower = members.filter(m => m._1 < id && cos(m._3, v) >= 0.99)
      if lower.nonEmpty
      m = lower.minBy(_._1)
    } yield id -> (cl, m._1, math.rint(cos(m._3, v) * 10000) / 10000)).toMap

    val got = Ann.semDedup(corpus, cents, threshold = 0.99).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == want)
    // the planted 1.5x copies all land in their original's cluster
    // (cosine is scale-invariant) and are dropped at sim 1.0
    val offset = 100000L
    val copies = assigned.map(_._1).filter(_ >= offset)
    assert(copies.nonEmpty)
    for (c <- copies) {
      assert(got.contains(c), s"copy $c not dropped")
      assert(got(c)._3 == 1.0, s"copy $c sim")
    }
  }

  test("semDedup plan: per-cluster self-join is an equi-join on the cluster key, no cartesian") {
    val corpus = graft.queries.QueriesML.embedDedupCorpus(spark, dir)
    val cents = Ann.kmeansCentroids(emb, k = 4, iters = 2, dim = 64)
    val plan = Ann.semDedup(corpus, cents, threshold = 0.99)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "no cartesian")
    assert(!plan.contains("BroadcastNestedLoop"), "no nested-loop join")
  }

  test("PQ: codes equal a local argmax replay; ADC equals the quantized inner product") {
    import spark.implicits._
    val m = 4; val k = 8; val sub = 4 // dim 16
    val cb = Array.tabulate(m, k, sub)((mi, j, d) =>
      ((mi * 131 + j * 17 + d * 7) % 19) / 19.0 - 0.5)
    def localVec(id: Int): Array[Double] =
      Array.tabulate(m * sub)(d => ((id * 104729 + d * 31) % 997) / 997.0 - 0.5)
    val df = (0 until 40).map(i => (i.toLong, localVec(i).toSeq)).toDF("vec_id", "embedding")
    // codes vs local argmax (ties → lower code)
    val got = df.select(col("vec_id"), Ann.pqCodes(col("embedding"), cb).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    def localCodes(v: Array[Double]): Seq[Int] =
      (0 until m).map { mi =>
        val ips = (0 until k).map(j =>
          (0 until sub).map(d => v(mi * sub + d) * cb(mi)(j)(d)).sum)
        ips.indexOf(ips.max)
      }
    for (i <- 0 until 40)
      assert(got(i.toLong) == localCodes(localVec(i)), s"codes for vec $i")
    // ADC score of (q, x) IS the exact inner product of q with x's
    // QUANTIZED reconstruction — the PQ contract
    val top = Ann.pqTopK(df, df.filter(col("vec_id") === 0), k = 3, cb)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(top.length == 3 && top.forall(_._1 == 0L))
    val q = localVec(0)
    def adc(x: Int): Double = {
      val codes = localCodes(localVec(x))
      (0 until m).map(mi =>
        (0 until sub).map(d => q(mi * sub + d) * cb(mi)(codes(mi))(d)).sum).sum
    }
    val expect = (1 until 40).map(x => (x.toLong, adc(x)))
      .sortBy { case (id, s) => (-s, id) }.take(3)
    assert(top.map(t => (t._3, t._4)).toSeq.map(_._1) == expect.map(_._1),
      s"ADC ranking: got ${top.toSeq} want $expect")
    top.zip(expect).foreach { case ((_, _, _, s), (_, e)) =>
      assert(math.abs(s - e) < 1e-12) }
  }

  test("PQ driver queries execute with codegen fallback DISABLED (Janino failure = red test)") {
    // Round-6 lesson: the plan's `*(codegen)` asterisks can lie — the
    // unrolled-codebook PQ lattice PLANNED as whole-stage codegen but the
    // generated method blew Janino's 64 KB cap and Spark silently ran it
    // interpreted. fallback=false + CODEGEN_ONLY turn that silent
    // downgrade into a thrown exception, so a future codegen-size
    // regression fails here instead of shipping a 5-11 s interpreted query.
    val conf = spark.conf
    val oldFallback = conf.get("spark.sql.codegen.fallback", "true")
    val oldFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val pq = graft.queries.QueriesR6.qAnnPq(spark, dir)
      assert(pq.count() > 0, "q_ann_pq under codegen-only")
      val ivfPq = graft.queries.QueriesR6.qAnnIvfPq(spark, dir)
      assert(ivfPq.count() > 0, "q_ann_ivf_pq under codegen-only")
    } finally {
      conf.set("spark.sql.codegen.fallback", oldFallback)
      conf.set("spark.sql.codegen.factoryMode", oldFactory)
    }
  }

  test("batched maximin init picks the same seed set as the sequential procedure") {
    // same planted-cluster fixture as the trained-quantizer test: 8
    // well-separated clusters, so maximin must take exactly one seed per
    // cluster in either pacing
    val nClusters = 8; val perCluster = 50; val dim = 64
    def vec(cluster: Int, j: Int): Array[Float] = {
      val v = Array.tabulate(dim) { d =>
        val h = (cluster * 7919 + j * 104729 + d * 31) % 997
        0.05f * ((h / 997.0f) - 0.5f)
      }
      v(cluster * (dim / nClusters)) += 1.0f
      v
    }
    import spark.implicits._
    val clustered = (for {
      c <- 0 until nClusters; j <- 0 until perCluster
    } yield ((c * perCluster + j).toLong, vec(c, j)))
      .toDF("vec_id", "embedding")
    // iters = 0 → the returned centroids ARE the init seeds
    val sequential = Ann.kmeansCentroids(clustered, k = nClusters, iters = 0,
      dim = dim, init = "farthest")
    val batched = Ann.kmeansCentroids(clustered, k = nClusters, iters = 0,
      dim = dim, init = "farthest", initBatch = 4)
    // 7 follow-up seeds in at most ceil(7/4) + boundary-retry scans. The
    // pool boundary rule keeps every batched pick TRUE maximin, so the
    // seed sequence is identical to the sequential procedure's
    assert(batched.map(_.toSeq).toSeq == sequential.map(_.toSeq).toSeq,
      "boundary-guarded batched maximin must reproduce the sequential seed sequence")
    // and the sequence covers every planted cluster exactly once (the
    // spike dimension identifies the cluster)
    def clusterOf(seed: Array[Long]): Int = {
      val spike = seed.zipWithIndex.maxBy(_._1)._2
      spike / (dim / nClusters)
    }
    assert(batched.map(clusterOf).toSet == (0 until nClusters).toSet,
      "batched maximin must land one seed in every planted cluster")
    // initBatch = 1 is bit-identical (same argmin row per scan)
    val one = Ann.kmeansCentroids(clustered, k = nClusters, iters = 0,
      dim = dim, init = "farthest", initBatch = 1)
    assert(one.map(_.toSeq).toSeq == sequential.map(_.toSeq).toSeq)
  }

  test("hardNegatives: never a same-label neighbor, never self, ranked by sim within the probed cells") {
    val labels: Map[Long, Int] =
      emb.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val centRows = emb.orderBy(col("vec_id")).limit(16)
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .collect()
    val got = Ann.hardNegatives(emb, emb.filter(col("vec_id") < 10), k = 5,
      centRows.map(_.getLong(0)), centRows.map(_.getSeq[Double](1).toArray),
      nprobe = 4, idCol = "vec_id", vecCol = "embedding", labelCol = "label")
      .collect()
    assert(got.nonEmpty)
    val byQuery = got.groupBy(_.getLong(0))
    byQuery.foreach { case (q, rows) =>
      assert(rows.length <= 5)
      rows.foreach { r =>
        val neighbor = r.getLong(2)
        assert(neighbor != q, s"self negative for $q")
        assert(labels(neighbor) != labels(q),
          s"same-label negative $neighbor for query $q")
        assert(r.getInt(3) == labels(neighbor), "neg_label column matches corpus")
      }
      // ranks are 1..n and similarity is non-increasing in rank
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rows.length))
      val sims = sorted.map(_.getDouble(4))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("mutualNearest: every pair is mutually top-1 by local replay; the global best pair always survives") {
    val a = emb.filter(col("label") === 0)
    val b = emb.filter(col("label") === 1)
    val aIds = a.collect().map(_.getLong(0)).toSet
    val bIds = b.collect().map(_.getLong(0)).toSet
    assert(aIds.nonEmpty && bIds.nonEmpty)
    def top1(from: Long, cands: Set[Long]): Long =
      cands.toSeq.map(c => (c, cos(vecs(from), vecs(c))))
        .sortBy { case (id, s) => (-s, id) }.head._1
    val got = Ann.mutualNearest(a, b).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.nonEmpty)
    got.foreach { case (ai, bi) =>
      assert(top1(ai, bIds) == bi, s"$bi is not $ai's top-1")
      assert(top1(bi, aIds) == ai, s"$ai is not $bi's top-1")
    }
    // the globally most-similar cross pair is mutual by construction
    val best = (for (ai <- aIds; bi <- bIds) yield (ai, bi, cos(vecs(ai), vecs(bi))))
      .toSeq.sortBy { case (ai, bi, s) => (-s, ai, bi) }.head
    assert(got.contains((best._1, best._2)), s"global best pair $best missing")
  }

  test("mutualNearest: cross-corpus id collisions are NOT self-matches") {
    import spark.implicits._
    // independent id spaces: both corpora use id 1; the vectors are
    // near-identical so (1,1) is the obvious mutual pair — dropping it
    // as a "self match" would return an empty result
    val a = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val b = Seq((1L, Seq(0.9f, 0.1f)), (3L, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val got = Ann.mutualNearest(a, b).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 1L)), s"colliding-id pair must survive: $got")
    assert(got.contains((2L, 3L)))
  }

  test("kmeans guards: farthest init never duplicates seeds; ragged vectors fail loudly") {
    import spark.implicits._
    // 2 distinct vectors, k = 3: must FAIL like init="first", not
    // silently duplicate a centroid (a re-picked seed has cosine 1.0)
    val tiny = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException](
      Ann.kmeansCentroids(tiny, k = 3, iters = 1, dim = 2, init = "farthest"))
    assert(e1.getMessage.contains("fewer than k"))
    // a ragged seed vector surfaces as the dim contract, not a bare AIOOBE
    val ragged = Seq((0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException](
      Ann.kmeansCentroids(ragged, k = 2, iters = 1, dim = 2))
    assert(e2.getMessage.contains("uniform"))
  }
}
