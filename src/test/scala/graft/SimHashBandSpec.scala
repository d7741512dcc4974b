package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.SimHash

/** The 5-block / 10-block-pair SimHash banding scheme (round-3 replacement
  * for 4×16-bit tables): proves the pigeonhole recall guarantee holds and
  * that bucket occupancy at corpus scale stays far below the maxBucket cap
  * — i.e. the cap is no longer a silent recall ceiling. Pure Scala (no
  * Spark): the scheme is deterministic arithmetic on fingerprints. */
class SimHashBandSpec extends AnyFunSuite {

  test("blocks partition the 64 bits; keys are injective per table") {
    val covered = SimHash.BlockOffsets.zip(SimHash.BlockWidths)
      .flatMap { case (o, w) => o until (o + w) }
    assert(covered.sorted.toSeq == (0 until 64))
    assert(SimHash.NumTables == 10)
    // a difference in either block of a pair changes that table's key
    val a = 0x0123456789abcdefL
    for (k <- 0 until SimHash.NumTables; bit <- 0 until 64) {
      val (i, j) = SimHash.BlockPairs(k)
      val inPair = (bit >= SimHash.BlockOffsets(i) && bit < SimHash.BlockOffsets(i) + SimHash.BlockWidths(i)) ||
        (bit >= SimHash.BlockOffsets(j) && bit < SimHash.BlockOffsets(j) + SimHash.BlockWidths(j))
      val same = SimHash.blockKey(a, k) == SimHash.blockKey(a ^ (1L << bit), k)
      assert(same == !inPair, s"tbl=$k bit=$bit")
    }
  }

  test("pigeonhole: every pair within Hamming distance 3 shares >= 1 table key (10k random cases)") {
    val rnd = new java.util.SplittableRandom(0xb10c5L)
    (0 until 10000).foreach { _ =>
      val a = rnd.nextLong()
      val d = 1 + rnd.nextInt(3)
      val bits = scala.collection.mutable.Set.empty[Int]
      while (bits.size < d) bits += rnd.nextInt(64)
      val b = bits.foldLeft(a)((x, i) => x ^ (1L << i))
      assert(SimHash.hamming(a, b) == d)
      assert((0 until SimHash.NumTables).exists(k =>
        SimHash.blockKey(a, k) == SimHash.blockKey(b, k)),
        f"pair at distance $d shares no key: a=$a%016x b=$b%016x")
    }
  }

  test("100k-doc corpus: random buckets stay tiny and every planted pair survives the 64-cap") {
    val rnd = new java.util.SplittableRandom(0x51aeed7L)
    val n = 100000
    val sims = Array.fill(n)(rnd.nextLong())
    // planted near-dups: ids n..n+499, each within distance <= 3 of a base doc
    val planted = (0 until 500).map { p =>
      val base = rnd.nextInt(n)
      val d = 1 + rnd.nextInt(3)
      val bits = scala.collection.mutable.Set.empty[Int]
      while (bits.size < d) bits += rnd.nextInt(64)
      (base, n + p, bits.foldLeft(sims(base))((x, i) => x ^ (1L << i)))
    }
    val all = sims ++ planted.map(_._3)
    // simulate the operator's capped buckets: members sorted by id, first 64
    // kept — planted ids are the LARGEST, so they are dropped first if a
    // bucket ever overflows (worst case for recall)
    val cap = 64
    var maxBucket = 0
    val recalled = Array.fill(planted.length)(false)
    for (k <- 0 until SimHash.NumTables) {
      val buckets = scala.collection.mutable.HashMap.empty[Long, scala.collection.mutable.ArrayBuffer[Int]]
      var id = 0
      while (id < all.length) { // ascending id == sorted member order
        val buf = buckets.getOrElseUpdate(SimHash.blockKey(all(id), k),
          new scala.collection.mutable.ArrayBuffer[Int])
        if (buf.length < cap) buf += id
        if (buf.length > maxBucket) maxBucket = buf.length
        id += 1
      }
      planted.zipWithIndex.foreach { case ((base, pid, sim), pi) =>
        if (!recalled(pi) && SimHash.blockKey(sims(base), k) == SimHash.blockKey(sim, k)) {
          val buf = buckets(SimHash.blockKey(sim, k))
          if (buf.contains(base) && buf.contains(pid)) recalled(pi) = true
        }
      }
    }
    // ~26-bit keys: expected occupancy 100k/2^26 << 1; even with birthday
    // collisions nothing approaches the 64 cap
    assert(maxBucket <= 8, s"max random-bucket occupancy $maxBucket")
    assert(recalled.forall(identity),
      s"${recalled.count(!_)} of ${planted.length} planted pairs lost to capping")
  }
}
