package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types._

import graft.dedup.Hashes

/** Cosine similarity of two double arrays in one fused JVM loop —
  * replaces an `aggregate(zip_with(...))` chain (three array traversals
  * plus lambda dispatch per element) with a single pass. Formula matches
  * the conventional dot/(|a|·|b|) with sequential accumulation.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"
  override val dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) java.lang.Double.valueOf(0.0)
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
  def compute(a: Any, b: Any): Double = nullSafeEval(a, b).asInstanceOf[Double]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineSim", this, classOf[CosineSim].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

object CosineSim {
  def apply(a: Column, b: Column): Column =
    EU.column(CosineSim(EU.expression(a.cast("array<double>")),
      EU.expression(b.cast("array<double>"))))
}

/** Random-hyperplane LSH bucket id as ONE fused expression: `nbits` sign
  * bits of dot products with `nbits × dim` deterministic pseudo-random
  * hyperplane components, precomputed once at plan build. The naive
  * Column spelling (`nbits × dim` `element_at` nodes summed) generates a
  * multi-hundred-node tree that blows up codegen and planning; this is a
  * single tight loop per row.
  */
case class LshBucketBits(child: Expression, dim: Int, nbits: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_bucket"
  override val dataType: DataType = LongType

  // hyperplane component matrix h(b, i) from splitmix64 → [-1, 1)
  @transient private lazy val planes: Array[Double] = {
    val a = new Array[Double](nbits * dim)
    var b = 0
    while (b < nbits) {
      var i = 0
      while (i < dim) {
        a(b * dim + i) = Hashes.mix64(seed ^ (b.toLong << 32) ^ i.toLong).toDouble /
          Long.MaxValue.toDouble
        i += 1
      }
      b += 1
    }
    a
  }

  override def nullSafeEval(v: Any): Any = java.lang.Long.valueOf(compute(v))

  def compute(v: Any): Long = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    var bucket = 0L
    var b = 0
    while (b < nbits) {
      var dot = 0.0
      val off = b * dim
      var i = 0
      while (i < n) { dot += arr.getDouble(i) * planes(off + i); i += 1 }
      if (dot >= 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshBucket", this, classOf[LshBucketBits].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(c: Expression): LshBucketBits =
    copy(child = c)
}

/** Similarity search over an embedding column.
  *
  * Baseline: brute-force top-k — broadcast the (small) query set against
  * the corpus, one window per query for the top-k. The scale path is
  * [[lshBuckets]] / [[ivfTopK]]: restrict the scan to a candidate bucket
  * set so the per-query work is corpus/`nlist`-ish instead of the full
  * corpus.
  */
object Ann {

  /** Brute-force exact top-k neighbors for each query vector.
    * `queries` must be broadcast-small (it is the build side).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val joined = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", CosineSim(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"))
  }

  /** Random-hyperplane LSH bucket id: `nbits` sign bits of dot products
    * with deterministic pseudo-random hyperplanes (seeded, no stored
    * model). Vectors in the same bucket are high-cosine candidates.
    * One fused codegen'd loop per row ([[LshBucketBits]]).
    */
  def lshBuckets(vec: Column, dim: Int, nbits: Int, seed: Long = 42L): Column =
    EU.column(LshBucketBits(EU.expression(vec.cast("array<double>")), dim, nbits, seed))

  /** Embedding near-dup pairs above a cosine threshold via LSH buckets +
    * exact verification (deterministic; recall bounded by bucket
    * granularity — standard LSH tradeoff, verified in AnnSpec).
    */
  def lshNearDupPairs(df: DataFrame, threshold: Double, dim: Int,
      nbits: Int = 8, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"),
      lshBuckets(col(vecCol).cast("array<double>"), dim, nbits).as("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("sim", CosineSim(col("a.v"), col("b.v")))
      .filter(col("sim") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("sim"), 4).as("sim"))
  }

  /** L2 normalization of an embedding column — the standard preprocessing
    * step before cosine-metric indexing (normalized vectors make cosine a
    * dot product). One fold + one map, no shuffle.
    */
  def l2Norm(vec: Column): Column =
    sqrt(aggregate(vec.cast("array<double>"), lit(0.0d), (acc, x) => acc + x * x))

  /** Note: divide by a precomputed norm column where possible — embedding
    * the fold inside the transform lambda re-evaluates it per element.
    */
  def l2Normalize(vec: Column, norm: Column): Column =
    transform(vec.cast("array<double>"), x => x / norm)

  /** IVF-style top-k: corpus assigned to `nlist` coarse cells (the
    * deterministic first-`nlist` corpus vectors serve as centroids);
    * each query probes its `nprobe` nearest cells only.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nlist: Int,
      nprobe: Int, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).as("cent_id"), col(vecCol).cast("array<double>").as("cvec"))
    val wAssign = Window.partitionBy(col("_rid")).orderBy(col("csim").desc, col("cent_id"))
    def assign(df: DataFrame, rid: Column, vec: Column, probes: Int): DataFrame =
      df.withColumn("_rid", rid)
        .join(broadcast(cents), lit(true))
        .withColumn("csim", CosineSim(vec, col("cvec")))
        .withColumn("_crank", row_number().over(wAssign))
        .filter(col("_crank") <= probes)
        .drop("cvec", "csim", "_crank")
    val corpusCells = assign(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("nvec")),
      col("neighbor_id"), col("nvec"), 1)
    val queryCells = assign(
      queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qvec")),
      col("query_id"), col("qvec"), nprobe)
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    queryCells.join(corpusCells, Seq("cent_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", CosineSim(col("qvec"), col("nvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("sim"), 4).as("sim"))
  }
}
