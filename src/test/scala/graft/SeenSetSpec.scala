package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SeenSetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def urlsDf(n: Int, tag: String) =
    (0 until n).map(i => s"https://h${i % 7}.example/$tag/d$i").toDF("url")
      .withColumn("bucket", Frontier.bucketCol(col("url"), 8))

  test("per-bucket bloom+cuckoo filters: no false negatives via per-partition probe") {
    val seen = urlsDf(3000, "seen")
    val filters = SeenSet.buildFilters(seen).persist()
    assert(filters.count() == 8)

    val bMisses = SeenSet.probeBloom(seen, filters).filter(!col("seenish")).count()
    val cMisses = SeenSet.probeCuckoo(seen, filters).filter(!col("seenish")).count()
    assert(bMisses == 0, "bloom false negative")
    assert(cMisses == 0, "cuckoo false negative")
  }

  test("splitByBloom: 'fresh' side is exact (bloom has no false negatives)") {
    val seen = urlsDf(2000, "seen")
    val filters = SeenSet.buildFilters(seen)
    val incoming = urlsDf(500, "seen").union(urlsDf(800, "new"))
    val (seenish, fresh) = SeenSet.splitByBloom(incoming, filters)
    val freshUrls = fresh.select("url").collect().map(_.getString(0)).toSet
    assert(freshUrls.forall(_.contains("/new/")), "a seen url leaked into fresh")
    assert(seenish.count() + fresh.count() == 1300)
    // bloom fp rate keeps seenish close to the true 500
    assert(seenish.count() >= 500 && seenish.count() <= 560)
  }

  test("probe is a narrow map: no join, no shuffle of the link stream") {
    val seen = urlsDf(1000, "seen")
    val filters = SeenSet.buildFilters(seen)
    val probed = SeenSet.probeBloom(urlsDf(400, "x"), filters)
    val plan = probed.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"probe plan contains a join:\n$plan")
    assert(!plan.contains("Exchange"), s"probe plan shuffles:\n$plan")
  }

  test("incremental filter-table merge keeps old membership") {
    val a = SeenSet.buildFilters(urlsDf(1000, "a"))
    val b = SeenSet.buildFilters(urlsDf(1000, "b"))
    val merged = SeenSet.mergeFilterTables(a, b).persist()
    val all = urlsDf(1000, "a").union(urlsDf(1000, "b"))
    val misses = SeenSet.probeBloom(all, merged).filter(!col("seenish"))
      .union(SeenSet.probeCuckoo(all, merged).filter(!col("seenish")))
      .count()
    assert(misses == 0)
  }
}
