package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank in EXACT integer arithmetic — entity-importance
  * scoring over a relation-derived graph (the host/domain-rank signal
  * crawl-scale corpus pipelines weight documents by; the reference has
  * no graph surface — task-mandated addendum; the iterative-convergence
  * sibling of `graft.dedup`'s label-propagation clustering).
  *
  * Determinism contract (pinned for the SQL oracle): total mass is an
  * integer budget split as `base = totalMass div N`; each iteration a
  * node sends `rank div outdeg` to every out-neighbor (truncating
  * division — deterministic, and the only place mass is lost besides
  * dangling nodes, both disclosed conventions) and updates to
  * `(15·base + 85·inflow) div 100` (d = 0.85 as an integer fraction).
  * Every operation is an integer sum/join — order-free, so any
  * partitioning yields the same ranks bit-for-bit, and the oracle
  * unrolls the K iterations as chained CTEs.
  *
  * Scale shape per iteration: ONE src-key equi-join (ranks into edges)
  * and ONE dst-key aggregate — the Pregel step as two exchanges over
  * the EDGE relation; the node relation is vertex-bounded. K is fixed
  * (no convergence test — a pure function of the input). At 100 TB
  * persist/checkpoint the edge relation and ranks between iterations;
  * the per-iteration plan is unchanged.
  */
object PageRank {

  /** Ranks after `iters` rounds: `(node, rank)`, exact integers summing
    * to ≤ totalMass. The vertex count is one bounded scalar collect.
    *
    * This is the UNROLLED reference form: the K rounds nest into one
    * plan, so analysis/codegen cost grows with K and every round
    * re-derives the edge lineage (ReusedExchange mitigates within one
    * execution, but the plan itself is O(K) nodes). Use
    * [[runPersisted]] — spec-pinned bit-identical — for real runs; this
    * form stays as the oracle-shaped reference the equality spec pins
    * against.
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
      totalMass: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && totalMass >= 1)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val n = nodes.count() // bounded: one scalar — the vertex count
    require(n > 0, "empty graph")
    val base = totalMass / n
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var r = nodes.select(col("node"), lit(base).as("rank"))
    var it = 0
    while (it < iters) {
      val inflow = e.join(outdeg, "src")
        .join(r.select(col("node").as("src"), col("rank")), "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("inflow"))
      r = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          expr(s"(15 * ${base}L + 85 * coalesce(inflow, 0L)) div 100").as("rank"))
      it += 1
    }
    r
  }

  /** Persisted-iteration PageRank — bit-identical ranks to [[run]]
    * (pinned by PageRankSpec at K=16: every operation is an order-free
    * integer sum, so materialising between rounds cannot change a
    * single bit), with the iterative-job shape real PageRank needs:
    *
    *  - the deduped edge relation, WITH its out-degree attached, is
    *    computed once and persisted — each round joins the cached
    *    relation instead of re-deriving scan → distinct → degree-agg
    *    lineage K times;
    *  - ranks are `localCheckpoint`ed every round, so round k+1 plans
    *    against a materialised leaf instead of a k-round-deep tree —
    *    plan/codegen cost per round is constant in K instead of the
    *    unrolled form's O(K) growth (measured: the unrolled plan is
    *    ~40 nodes per extra round and superlinear wall at K=16).
    *
    * `localCheckpoint` (block-manager, not reliable storage) is the
    * right local/standalone truncation; on a dynamic-allocation
    * cluster swap it for `checkpoint` on a reliable dir — the loop
    * shape is unchanged. All cached state is vertex/edge-bounded and
    * unpersisted before returning (the final ranks are themselves a
    * checkpointed leaf, so nothing the caller holds depends on it).
    */
  def runPersisted(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, totalMass: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && totalMass >= 1)
    import org.apache.spark.storage.StorageLevel
    // persist the deduped edges FIRST: nodes and the degree join both
    // derive from it, and without the cache each would replay the
    // upstream scan → join → distinct lineage from scratch
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // pre-partition + pre-sort the loop-invariant relations on their
    // join keys (the Dedup.clusters pattern): the cached partitioning/
    // ordering survives persist, so each round's sort-merge joins reuse
    // the big cached side as-is and only the (node-sized) rank side
    // exchanges — without this, every round re-exchanged and re-sorted
    // the edge relation
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .repartition(col("node")).sortWithinPartitions("node")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // bounded: one scalar — the vertex count
    require(n > 0, "empty graph")
    val base = totalMass / n
    // contribution edges with out-degree attached: derived once, reused
    // every round (the unrolled form re-plans this join per round)
    val esrc = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .repartition(col("src")).sortWithinPartitions("src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var r = nodes.select(col("node"), lit(base).as("rank"))
    var it = 0
    while (it < iters) {
      val inflow = esrc
        .join(r.select(col("node").as("src"), col("rank")), "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("inflow"))
      r = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          expr(s"(15 * ${base}L + 85 * coalesce(inflow, 0L)) div 100").as("rank"))
        .localCheckpoint() // eager: truncate lineage between rounds
      it += 1
    }
    // the final ranks are a checkpointed leaf — safe to drop the loop state
    e.unpersist()
    nodes.unpersist()
    esrc.unpersist()
    r
  }
}
