package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: unrolled vs persisted-iteration PageRank on the real
  * q_pagerank graph (orders↔suppliers co-purchase, symmetrized) at
  * K = 4 (the shipped query) and K = 16 (the real-PageRank regime the
  * VERDICT asked to be measured) — wall time per variant, one warm
  * session. Backs the r8 BENCH.md/OPTIMIZATION_r08.md K-scaling row.
  * Args: sfDir [k...]
  */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val ks = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(4, 16)
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val orders = s.read.parquet(s"$sfDir/orders.parquet")
    val li = s.read.parquet(s"$sfDir/lineitem.parquet")
    val fwd = orders.join(li, orders("o_orderkey") === li("l_orderkey"))
      .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
      .distinct()
    val edges = fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"PAGERANK $label%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm both paths once at K=2
    graft.graph.PageRank.run(edges, "src", "dst", 2).queryExecution.toRdd.count()
    graft.graph.PageRank.runPersisted(edges, "src", "dst", 2).queryExecution.toRdd.count()
    for (k <- ks) {
      time(s"unrolled  K=$k") {
        graft.graph.PageRank.run(edges, "src", "dst", k).queryExecution.toRdd.count()
      }
      time(s"persisted K=$k") {
        graft.graph.PageRank.runPersisted(edges, "src", "dst", k).queryExecution.toRdd.count()
      }
    }
    s.stop()
  }
}
