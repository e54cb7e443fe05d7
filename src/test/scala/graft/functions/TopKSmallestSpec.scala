package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Hashes

/** Buffer-level fuzz of [[TopKSmallest]]'s offer/compact/merge discipline —
  * no Spark session: the invariant under test is pure (the k smallest
  * values win under ANY chunking of the input and ANY merge order, with
  * O(k) buffer occupancy throughout).
  */
class TopKSmallestSpec extends AnyFunSuite {

  private def u(s: String): UTF8String = UTF8String.fromString(s)

  /** Deterministic pseudo-random value stream (Hashes.mix64 like the
    * WordShingles fuzz): short hex-ish strings with many duplicates at
    * small seeds so ties and repeats are exercised.
    */
  private def values(seed: Long, n: Int, space: Int): Seq[String] =
    (0 until n).map { i =>
      val h = Hashes.mix64(seed * 1000003L + i)
      f"${((h % space) + space) % space}%06x"
    }

  private def result(buf: TopKSmallest.Buffer, k: Int): Seq[String] = {
    buf.compact(k)
    buf.values.map(_.toString).toSeq
  }

  test("fuzz: any chunking + any merge order equals sorted.take(k)") {
    for (seed <- 0L until 30L) {
      val n = 1 + (Hashes.mix64(seed) & 0xff).toInt            // 1..256
      val k = 1 + (Hashes.mix64(seed + 99) & 0x0f).toInt       // 1..16
      val space = 1 + (Hashes.mix64(seed + 7) & 0x3f).toInt    // dup-heavy
      val vs = values(seed, n, space)
      val want = vs.sorted.take(k)

      // chunk into a pseudo-random number of partial buffers
      val nChunks = 1 + (Hashes.mix64(seed + 13) & 0x7).toInt  // 1..8
      val chunks = vs.grouped(math.max(1, n / nChunks)).toSeq
      val partials = chunks.map { c =>
        val b = new TopKSmallest.Buffer(new ArrayBuffer[UTF8String])
        c.foreach(v => b.offer(u(v), k))
        // partial occupancy never exceeds the 2k compact threshold
        assert(b.values.length < 2 * k + 1, s"partial grew past 2k (seed $seed)")
        b
      }
      // merge right-to-left vs left-to-right: same winners
      val lr = partials.reduceLeft { (a, b) => b.values.foreach(a.offer(_, k)); a }
      assert(result(lr, k) == want, s"LR merge diverged (seed $seed)")
      val partials2 = chunks.map { c =>
        val b = new TopKSmallest.Buffer(new ArrayBuffer[UTF8String])
        c.foreach(v => b.offer(u(v), k))
        b
      }
      val rl = partials2.reduceRight { (a, b) => a.values.foreach(b.offer(_, k)); b }
      assert(result(rl, k) == want, s"RL merge diverged (seed $seed)")
    }
  }

  test("rejection path: once k values are sorted in, larger candidates don't grow the buffer") {
    val k = 4
    val b = new TopKSmallest.Buffer(new ArrayBuffer[UTF8String])
    Seq("a", "b", "c", "d").foreach(v => b.offer(u(v), k))
    b.compact(k)
    val before = b.values.length
    Seq("e", "f", "zzz", "d").foreach(v => b.offer(u(v), k)) // all >= current k-th
    assert(b.values.length == before, "candidates >= the k-th smallest must be rejected on arrival")
    b.offer(u("0"), k) // smaller: must be accepted
    assert(result(b, k) == Seq("0", "a", "b", "c"))
  }
}
