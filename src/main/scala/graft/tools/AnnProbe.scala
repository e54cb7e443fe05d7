package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sim.{Ann, CosineSim}

/** Scratch probe: three spellings of the occupancy-guarded LSH near-dup
  * at sf0.1, min-of-3 wall each — picks the guarded plan shape for
  * q_embed_neardup (backs the round-4 PLANS.md/BENCH.md note).
  *
  *   A: guard-off bucket self-join (round-3 shape, no guard)
  *   B: window occupancy count + filter + self-join (guard, no lists)
  *   C: bounded posting lists + in-posting expansion (guard in the agg)
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val corpus = graft.queries.QueriesML.embedDedupCorpus(s, dir)
    val n = corpus.count()
    val bits = Ann.nbitsFor(n)
    def bucketed: DataFrame = corpus.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v"),
      Ann.lshBuckets(col("embedding").cast("array<double>"), 64, bits).as("bucket"))

    def finish(paired: DataFrame): DataFrame = paired
      .withColumn("sim", CosineSim(col("va"), col("vb")))
      .filter(col("sim") >= 0.99)
      .select(col("ida"), col("idb"))

    def variantA: DataFrame = {
      val b = bucketed
      finish(b.as("a").join(b.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .select(col("a.id").as("ida"), col("a.v").as("va"),
          col("b.id").as("idb"), col("b.v").as("vb")))
    }
    def variantB: DataFrame = {
      val kept = bucketed
        .withColumn("occ", count(lit(1)).over(Window.partitionBy("bucket")))
        .filter(col("occ") <= 1000)
      finish(kept.as("a").join(kept.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .select(col("a.id").as("ida"), col("a.v").as("va"),
          col("b.id").as("idb"), col("b.v").as("vb")))
    }
    def variantC: DataFrame = {
      val postings = bucketed.groupBy("bucket")
        .agg(graft.functions.BoundedCollectList(struct(col("id"), col("v")), 1000).as("ps"))
        .filter(col("ps").isNotNull)
      finish(postings
        .select(explode(col("ps")).as("a"), col("ps"))
        .select(col("a"), explode(col("ps")).as("b"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id").as("ida"), col("a.v").as("va"),
          col("b.id").as("idb"), col("b.v").as("vb")))
    }

    for ((name, mk) <- Seq("A_selfjoin_noguard" -> (() => variantA),
        "B_window_guard" -> (() => variantB),
        "C_postings_guard" -> (() => variantC))) {
      val rows = mk().count() // warm + sanity
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        mk().count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"ANN $name%-20s rows=$rows best=$best%.3f s")
    }
    s.stop()
  }
}
