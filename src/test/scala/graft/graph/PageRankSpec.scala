package graft.graph

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  private def localRank(edges: Seq[(Long, Long)], iters: Int,
      totalMass: Long): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val base = totalMass / nodes.length
    val outdeg = e.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var r = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val inflow = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / outdeg(s) }.sum).toMap
      r = nodes.map(n => n -> (15L * base + 85L * inflow.getOrElse(n, 0L)) / 100L).toMap
    }
    r
  }

  test("distributed ranks equal the local integer replay on a hand graph") {
    // hub node 1 receives from everyone; 5 is dangling (out-edges only
    // via none — receives from 4, sends nowhere)
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L), (2L, 3L), (4L, 5L))
    val got = PageRank.run(edges.toDF("src", "dst"), "src", "dst",
        iters = 3, totalMass = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == localRank(edges, 3, 1000000L))
    // the hub outranks every other node
    assert(got(1L) == got.values.max)
  }

  test("ranks are partitioning-invariant and mass never exceeds the budget") {
    val edges = (1 to 200).flatMap(i =>
      Seq((i.toLong, ((i * 7) % 50).toLong + 1000L), (((i * 3) % 40).toLong + 1000L, i.toLong)))
    val df = edges.toDF("src", "dst")
    val a = PageRank.run(df, "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.run(df.repartition(13), "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "ranks must not depend on partitioning")
    assert(a.values.sum <= 1000000000000L, "truncating flow can only LOSE mass")
    assert(a == localRank(edges, 4, 1000000000000L))
  }

  test("runPersisted is bit-identical to the unrolled form at K=16") {
    // deep iteration count: the regime the persisted form exists for —
    // equality here pins that materialising ranks between rounds
    // (localCheckpoint) and pre-joining out-degrees changes nothing
    val edges = (1 to 150).flatMap(i =>
      Seq((i.toLong, ((i * 11) % 60).toLong + 500L), (((i * 5) % 45).toLong + 500L, i.toLong)))
    val df = edges.toDF("src", "dst")
    val unrolled = PageRank.run(df, "src", "dst", iters = 16, totalMass = 999999999L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val persisted = PageRank.runPersisted(df, "src", "dst", iters = 16, totalMass = 999999999L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(persisted == unrolled, "persisted-iteration ranks must match the unrolled reference")
    assert(persisted == localRank(edges, 16, 999999999L))
  }

  test("runPersisted guards: empty graph fails loudly") {
    intercept[IllegalArgumentException](
      PageRank.runPersisted(Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst", 2))
  }

  test("guards: empty graph and bad iters fail loudly") {
    intercept[IllegalArgumentException](
      PageRank.run(Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst", 0))
    intercept[IllegalArgumentException](
      PageRank.run(Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst", 2))
  }
}
