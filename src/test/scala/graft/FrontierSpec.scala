package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.util.Random

class FrontierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val cfg = CrawlConfig(batchSize = 50, perHostCap = 3, nBuckets = 8, saltBuckets = 4)

  def mkFrontier(n: Int, seed: Long) = {
    val rng = new Random(seed)
    (0 until n).map { i =>
      val host = s"h${rng.nextInt(5)}.example" // few hosts → heavy per-host skew
      FrontierEntry(s"https://$host/d$i", host, 0, rng.nextInt(100).toLong,
        popped = rng.nextDouble() < 0.2)
    }
  }

  test("bounded-heap per-host pop == plain single-window pop (exactness under skew)") {
    val entries = mkFrontier(2000, 11L)
    val df = spark.createDataset(entries).toDF()
      .withColumn("bucket", Frontier.bucketCol(col("url"), cfg.nBuckets))
    val got = Frontier.popBatch(df, cfg)
      .select("url").collect().map(_.getString(0)).toSet

    // naive direct rule: single host window, then per-bucket budget —
    // identical result proves the HostTopK partial-aggregate cap is exact
    val naive = df.filter(!col("popped"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("host")).orderBy(col("priority").desc, col("url").asc)))
      .filter(col("rk") <= cfg.perHostCap)
      .withColumn("rk2", row_number().over(
        Window.partitionBy(col("bucket")).orderBy(col("priority").desc, col("url").asc)))
      .filter(col("rk2") <= Frontier.perBucketBudget(cfg))
      .select("url").collect().map(_.getString(0)).toSet
    assert(got == naive)

    // pure-Scala bucket twin matches the Catalyst bucket column
    val rows = df.select("url", "bucket").collect()
    rows.foreach { r =>
      assert(Frontier.bucketOf(r.getString(0), cfg.nBuckets) == r.getInt(1))
    }
  }

  test("politeness-off cap routes to the spill-safe window pop, same result set") {
    val entries = mkFrontier(2000, 17L)
    val df = spark.createDataset(entries).toDF()
      .withColumn("bucket", Frontier.bucketCol(col("url"), cfg.nBuckets))
    // cap = "batch size" (politeness off), far above the spill bound → the
    // window form runs; forcing the heap form via a raised bound must give
    // the identical pop set (both implement the same per-host top-k rule)
    val bigCap = cfg.copy(batchSize = 500, perHostCap = 500,
      hostTopKSpillBound = 100)
    val viaWindow = Frontier.popBatch(df, bigCap)
      .select("url").collect().map(_.getString(0)).toSet
    val viaHeap = Frontier.popBatch(df,
        bigCap.copy(hostTopKSpillBound = Int.MaxValue))
      .select("url").collect().map(_.getString(0)).toSet
    assert(viaWindow == viaHeap)
    assert(viaWindow.nonEmpty)
  }

  test("HostTopK aggregator: trim boundary, merge path, tie order, k=1") {
    def cand(p: Long, u: String) = Frontier.PopCand(u, 0, p)
    val agg3 = new Frontier.HostTopK(3)
    // reduce far past the 2k trim boundary: survivors are the exact top-3
    var buf = agg3.zero
    (1 to 100).foreach(i => buf = agg3.reduce(buf, cand(i.toLong, s"u$i")))
    assert(agg3.finish(buf).map(_.priority).sorted == Seq(98L, 99L, 100L))
    // merge of two partial buffers == top-3 of the union
    var a = agg3.zero; var b = agg3.zero
    Seq(5L, 1L, 9L).foreach(p => a = agg3.reduce(a, cand(p, s"a$p")))
    Seq(7L, 3L, 8L).foreach(p => b = agg3.reduce(b, cand(p, s"b$p")))
    assert(agg3.finish(agg3.merge(a, b)).map(_.priority).toSet == Set(9L, 8L, 7L))
    // equal priorities break ties by url asc — exactly like the window rule
    val agg1 = new Frontier.HostTopK(1)
    var t = agg1.zero
    Seq("zz", "aa", "mm").foreach(u => t = agg1.reduce(t, cand(4L, u)))
    assert(agg1.finish(t).map(_.url) == Seq("aa"))
  }

  test("merge is order-insensitive: link batches split arbitrarily give the same frontier") {
    val rng = new Random(5L)
    val links = (0 until 500).map { i =>
      val host = s"h${rng.nextInt(10)}.example"
      Link(s"https://$host/p${rng.nextInt(80)}", host, 1L + rng.nextInt(3))
    }
    val frontier0 = spark.createDataset(mkFrontier(100, 3L)).toDF()
    val emptyPop = spark.emptyDataset[FrontierEntry].toDF().select("url", "host")

    def mergeAll(batches: Seq[Seq[Link]]): Map[String, (Long, Boolean)] = {
      var f = frontier0
      batches.foreach { b =>
        val agg = spark.createDataset(b).groupBy($"url", $"host")
          .agg(sum($"weight").as("weight"))
        f = Frontier.merge(f, agg, emptyPop, cfg)
          .select("url", "host", "bucket", "priority", "popped")
      }
      f.select("url", "priority", "popped").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    }

    val oneShot = mergeAll(Seq(links))
    val split3 = mergeAll(Seq(links.take(100), links.slice(100, 350), links.drop(350)))
    assert(oneShot == split3)
  }

  test("merge: increments on popped entries keep popped=true (src/page.rs:33-50)") {
    val f0 = spark.createDataset(Seq(
      FrontierEntry("https://a.example/x", "a.example", 0, 5L, popped = true),
      FrontierEntry("https://a.example/y", "a.example", 0, 2L, popped = false))).toDF()
    val links = Seq(Link("https://a.example/x", "a.example", 7L)).toDS()
      .groupBy($"url", $"host").agg(sum($"weight").as("weight"))
    val emptyPop = spark.emptyDataset[FrontierEntry].toDF().select("url", "host")
    val merged = Frontier.merge(f0, links, emptyPop, cfg)
      .select("url", "priority", "popped", "was_existing", "was_incoming").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2), r.getInt(3), r.getInt(4)))).toMap
    assert(merged("https://a.example/x") == ((12L, true, 1, 1))) // inc'd, still popped, dup hit
    assert(merged("https://a.example/y") == ((2L, false, 1, 0)))
  }
}
