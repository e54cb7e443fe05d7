package graft.sim

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  private def toCodes(s: String): Array[Int] = s.split(",").map(_.toInt)

  test("sq8 codes: hand-computed affine map, clamping, degenerate dim") {
    // dim 0: range [0, 1]; dim 1: range [-2, 2]; dim 2: degenerate (all 5.0)
    val emb = Seq(
      (1L, Seq(0.0f, -2.0f, 5.0f)),
      (2L, Seq(0.5f, 0.0f, 5.0f)),
      (3L, Seq(1.0f, 2.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val (mins, maxs) = Quantize.sq8Train(emb, "embedding", dim = 3)
    assert(mins.toSeq == Seq(0.0, -2.0, 5.0) && maxs.toSeq == Seq(1.0, 2.0, 5.0))
    val out = emb.select(col("vec_id"),
        Quantize.sq8(col("embedding"), mins, maxs, asString = true).as("c"))
      .orderBy("vec_id").as[(Long, String)].collect()
    // x=min → 0; midpoint → floor(0.5*256)=128; x=max → 256 clamped to 255;
    // degenerate dim → 0 always
    assert(out.toSeq == Seq(
      (1L, "0,0,0"), (2L, "128,128,0"), (3L, "255,255,0")))
  }

  test("string face and array face produce identical codes") {
    val emb = Seq.tabulate(50) { i =>
      (i.toLong, Seq.tabulate(8)(d => math.sin(i * 7 + d * 3).toFloat))
    }.toDF("vec_id", "embedding")
    val (mins, maxs) = Quantize.sq8Train(emb, "embedding", dim = 8)
    val both = emb.select(col("vec_id"),
        Quantize.sq8(col("embedding"), mins, maxs, asString = true).as("s"),
        Quantize.sq8(col("embedding"), mins, maxs).as("a"))
      .as[(Long, String, Seq[Int])].collect()
    both.foreach { case (_, s, a) =>
      assert(toCodes(s).toSeq == a)
      assert(a.forall(c => c >= 0 && c <= 255))
    }
  }

  test("reconstruction error is bounded by one quantization step per dim") {
    val emb = Seq.tabulate(40) { i =>
      (i.toLong, Seq.tabulate(4)(d => (math.cos(i * 3 + d) * 2).toFloat))
    }.toDF("vec_id", "embedding")
    val (mins, maxs) = Quantize.sq8Train(emb, "embedding", dim = 4)
    val rows = emb.select(col("embedding").cast("array<double>").as("v"),
        Quantize.sq8(col("embedding"), mins, maxs).as("c"))
      .as[(Seq[Double], Seq[Int])].collect()
    rows.foreach { case (v, c) =>
      v.indices.foreach { d =>
        val step = (maxs(d) - mins(d)) / 256.0
        val recon = mins(d) + (c(d) + 0.5) * step
        assert(math.abs(v(d) - recon) <= step,
          s"dim $d: x=${v(d)} recon=$recon step=$step")
      }
    }
  }

  test("corrupt rows are bounded: short, long and null-element vectors") {
    val emb = Seq(
      (1L, Seq(Some(0.1f), Some(0.2f))),            // shorter than trained dim
      (2L, Seq(Some(0.1f), Some(0.2f), Some(0.3f), Some(0.4f))), // longer
      (3L, Seq(Some(0.1f), None, Some(0.3f)))       // null element
    ).toDF("vec_id", "embedding")
    val mins = Array(0.0, 0.0, 0.0)
    val maxs = Array(1.0, 1.0, 1.0)
    val out = emb.select(col("vec_id"),
        Quantize.sq8(col("embedding"), mins, maxs, asString = true).as("c"))
      .orderBy("vec_id").as[(Long, String)].collect().toMap
    assert(toCodes(out(1L)).length == 2)   // bounded to the row
    assert(toCodes(out(2L)).length == 3)   // bounded to the trained dim
    assert(toCodes(out(3L)).toSeq == Seq(25, 0, 76)) // null element → 0
  }

  test("q_embed_quantize executes with codegen fallback DISABLED (plan stays compiled)") {
    val conf = spark.conf
    val oldFallback = conf.get("spark.sql.codegen.fallback", "true")
    val oldFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val n = graft.queries.QueriesR7c.qEmbedQuantize(spark, "/root/testdata/sf0.001")
        .count()
      assert(n > 0)
    } finally {
      conf.set("spark.sql.codegen.fallback", oldFallback)
      conf.set("spark.sql.codegen.factoryMode", oldFactory)
    }
  }

  test("encode pass plan: zero exchanges after training (parquet-backed)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (mins, maxs) = Quantize.sq8Train(emb, "embedding", dim = 64)
    val plan = emb.select(col("vec_id"),
        Quantize.sq8(col("embedding"), mins, maxs).as("codes"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode pass must not shuffle:\n$plan")
    assert(plan.contains("sq8_codes"))
  }
}
