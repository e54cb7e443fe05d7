package graft.route

import graft.SparkTestBase
import graft.model.TranscriptGen
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  test("generator plants heavy-hitter conversations (skew is real)") {
    val turns = TranscriptGen.generateLocal(42L, 200L)
    val byConv = turns.groupBy(_.conv_id).view.mapValues(_.size).toMap
    val total = turns.size.toDouble
    val heavyShare = byConv.filter(_._1.toLowerCase.endsWith("00")).values.sum / total
    assert(byConv.values.max > 10 * (total / byConv.size), "heavy conv >> mean")
    assert(heavyShare > 0.2, f"1%% of convs should own >20%% of turns, got $heavyShare%.2f")
  }

  test("salted two-stage aggregation equals direct aggregation") {
    val df = TranscriptGen.generate(spark, 42L, 120L, 4).toDF()
    val direct = df.groupBy(col("conv_id"))
      .agg(count(lit(1)).as("turns"), sum(octet_length(col("text"))).as("bytes"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val salted = Skew.saltedCounts(df, "conv_id", "text", salts = 8)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(salted == direct)
  }

  test("salted repartition spreads a hot conversation across partitions") {
    val df = TranscriptGen.generate(spark, 42L, 101L, 4).toDF()
    val spread = Skew.saltedRepartition(df, "conv_id", salts = 8,
        numPartitions = 8, orderEntropy = col("turn_idx"))
      .withColumn("_pid", spark_partition_id())
      .filter(col("conv_id") === TranscriptGen.convId(0)) // the heavy one
      .select("_pid").distinct().count()
    assert(spread > 1, "heavy conversation must land on multiple partitions")
  }
}
