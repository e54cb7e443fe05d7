package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: maximin k-means seeding, sequential (initBatch=1 → one Spark
  * job per seed) vs boundary-guarded batched (initBatch=m → one pooled
  * scan per accepted batch). Args: [nVecs] [dim] [k] [initBatch].
  * Reports wall time and the Spark JOB count of each init — the claim
  * is the job count: at k=4096 the sequential init is 4095 serialized
  * scheduler round-trips regardless of data size, and batching divides
  * that by the accepted batch size while the boundary rule keeps the
  * seed sequence exactly maximin (AnnSpec asserts sequence equality).
  */
object MaximinProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = if (args.nonEmpty) args(0).toInt else 100000
    val dim = if (args.length > 1) args(1).toInt else 64
    val k = if (args.length > 2) args(2).toInt else 32
    val m = if (args.length > 3) args(3).toInt else 8
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    // Two corpus shapes:
    //  - "planted": k well-separated clusters — maximin's ADVERSARIAL
    //    case for batching (the whole candidate pool sits in the single
    //    farthest cluster, so the boundary rule ends most batches after
    //    one pick: correctness preserved, speedup limited);
    //  - "uniform": unstructured embeddings — the realistic quantizer-
    //    training shape, where the pool is direction-diverse and batches
    //    fill up (jobs ≈ k/m).
    val perCluster = nVecs / k
    // deterministic but hash-random per (id, d): the earlier modular
    // lattice (id·p + d·q mod 997) repeated every 997 ids, planting exact
    // duplicate directions that degenerate ANY batching
    def jitter(d: org.apache.spark.sql.Column) =
      pmod(xxhash64(col("id"), d), lit(9973L)).cast("double") / 9973.0 - 0.5
    val planted = s.range(nVecs.toLong).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d => {
        val cluster = (col("id") / perCluster).cast("int")
        when(d === cluster % dim, jitter(d) * 0.05 + 1.0).otherwise(jitter(d) * 0.05)
      }).as("embedding"))
      .repartition(32).cache()
    val uniform = s.range(nVecs.toLong).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d => jitter(d)).as("embedding"))
      .repartition(32).cache()
    planted.count(); uniform.count()

    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }

    def run(name: String, df: org.apache.spark.sql.DataFrame, batch: Int): Unit = {
      jobs.set(0)
      s.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val seeds = graft.sim.Ann.kmeansCentroids(df, k, iters = 0, dim = dim,
        init = "farthest", initBatch = batch)
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.CoreBridge.waitListenerBusEmpty(s.sparkContext)
      s.sparkContext.removeSparkListener(listener)
      println(f"$name%-30s k=$k seeds=${seeds.length} jobs=${jobs.get}%4d wall=$sec%7.2fs")
    }

    // JIT/codegen warmup off the measured path
    graft.sim.Ann.kmeansCentroids(uniform.limit(2000), math.min(k, 8), iters = 0,
      dim = dim, init = "farthest", initBatch = m)

    run("uniform   sequential (m=1)", uniform, 1)
    run(s"uniform   batched   (m=$m)", uniform, m)
    run("planted   sequential (m=1)", planted, 1)
    run(s"planted   batched   (m=$m)", planted, m)
    s.stop()
  }
}
