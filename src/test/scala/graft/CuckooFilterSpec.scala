package graft

import org.scalatest.funsuite.AnyFunSuite

class CuckooFilterSpec extends AnyFunSuite {

  def urls(n: Int, tag: String): Seq[String] =
    (0 until n).map(i => s"https://h$i.example/$tag/d$i")

  test("no false negatives on inserted set") {
    val f = CuckooFilter.forCapacity(2000)
    val in = urls(2000, "in")
    in.foreach(u => assert(f.insert(u)))
    assert(in.forall(f.contains))
  }

  test("false-positive rate is small") {
    val f = CuckooFilter.forCapacity(5000)
    urls(5000, "in").foreach(f.insert)
    val fps = urls(20000, "out").count(f.contains)
    assert(fps < 200, s"fp rate too high: $fps / 20000") // 16-bit fp → ~0.05% expected
  }

  test("delete removes membership (the capability Bloom lacks)") {
    val f = CuckooFilter.forCapacity(1000)
    val in = urls(1000, "x")
    in.foreach(f.insert)
    in.take(500).foreach(u => assert(f.delete(u)))
    assert(in.take(500).count(f.contains) < 5) // residual fp collisions only
    assert(in.drop(500).forall(f.contains))
  }

  test("merge preserves both sides' membership") {
    val a = new CuckooFilter(1024)
    val b = new CuckooFilter(1024)
    val ua = urls(800, "a")
    val ub = urls(800, "b")
    ua.foreach(a.insert)
    ub.foreach(b.insert)
    a.merge(b)
    assert((ua ++ ub).forall(a.contains))
  }

  test("serialize round-trip") {
    val f = CuckooFilter.forCapacity(500)
    val in = urls(500, "s")
    in.foreach(f.insert)
    val g = CuckooFilter.deserialize(f.serialize())
    assert(in.forall(g.contains))
    assert(g.numBuckets == f.numBuckets)
  }

  test("aggregator finish terminates on duplicate-heavy input (>8 copies of one url)") {
    // pre-fix this spun forever: an identical fingerprint fits at most 8
    // slots across its two candidate buckets, so growing never helped
    val agg = new SeenSet.CuckooAggregator
    val buf = agg.zero
    (0 until 50).foreach(_ => agg.reduce(buf, "https://dup.example/same"))
    urls(100, "mix").foreach(u => agg.reduce(buf, u))
    val f = CuckooFilter.deserialize(agg.finish(buf))
    assert(f.contains("https://dup.example/same"))
    assert(urls(100, "mix").forall(f.contains))
  }

  test("forCapacity stays in Long math at huge capacities (no Int wrap)") {
    // pre-fix (n/4*100/95).toInt wrapped negative for n ~> 81.6B and built a
    // tiny filter; now it must fail loudly at the single-shard bound instead
    intercept[IllegalArgumentException] {
      CuckooFilter.forCapacity(100_000_000_000L)
    }
    // and a large-but-legal capacity still rounds to a sane bucket count
    val f = CuckooFilter.forCapacity(1_000_000L)
    assert(f.numBuckets >= 1_000_000 / 4 && f.numBuckets <= 1_000_000)
  }

  test("hash64 is stable") {
    assert(CuckooFilter.hash64("https://a.example/") == CuckooFilter.hash64("https://a.example/"))
    assert(CuckooFilter.hash64("a") != CuckooFilter.hash64("b"))
  }
}
