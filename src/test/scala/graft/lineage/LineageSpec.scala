package graft.lineage

import java.nio.file.Files

import graft.SparkTestBase
import graft.model.TranscriptGen
import org.apache.spark.sql.functions._

/** Resume/exactly-once test (FIXTURES.md §5.4): kill after a partial
  * commit → rerun → final per-sink counts identical to a clean run, no
  * duplicates — the registrar's crash-safety contract
  * (`lc-lib/registrar/registrar.go:94-146`) upgraded to idempotent
  * commits.
  */
class LineageSpec extends SparkTestBase {

  private def freshRoot(): String =
    Files.createTempDirectory("graft-lineage").toString

  private lazy val turns =
    TranscriptGen.generate(spark, seed = 13L, nConvs = 30L, parallelism = 4).toDF()

  test("clean run commits all buckets exactly once") {
    val root = freshRoot()
    val n = Lineage.run(turns, root, nBuckets = 8, batchId = "b1")
    assert(n == Lineage.committed(root).size)
    val got = Lineage.readData(spark, root)
    assert(got.count() == turns.count())
    assert(got.select("conv_id", "turn_idx").distinct().count() == turns.count())
  }

  test("crash after partial commit, rerun yields identical exactly-once output") {
    val root = freshRoot()
    // simulated crash: only 3 of 8 buckets sealed
    val first = Lineage.run(turns, root, nBuckets = 8, batchId = "b1", maxBucketsToCommit = 3)
    assert(first == 3)
    assert(Lineage.committed(root).size == 3)
    // resumed run processes only the remaining buckets
    val second = Lineage.run(turns, root, nBuckets = 8, batchId = "b2")
    assert(Lineage.committed(root).size == first + second)
    val got = Lineage.readData(spark, root)
    assert(got.count() == turns.count())
    // no duplicated rows across the two runs
    assert(got.select("conv_id", "turn_idx").distinct().count() == turns.count())
    // lineage row counts sum to the input size
    val lineageRows = Lineage.readEntries(spark, root).agg(sum("rows")).collect()(0).getLong(0)
    assert(lineageRows == turns.count())
  }

  test("rerun of a fully committed root is a no-op") {
    val root = freshRoot()
    Lineage.run(turns, root, nBuckets = 4, batchId = "b1")
    val again = Lineage.run(turns, root, nBuckets = 4, batchId = "b2")
    assert(again == 0)
    assert(Lineage.readData(spark, root).count() == turns.count())
  }
}
