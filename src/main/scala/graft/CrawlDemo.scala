package graft

import org.apache.spark.sql.SparkSession

/** CLI driver for the crawl engine: generates the deterministic corpus, runs
  * (or resumes) the BSP crawl loop, prints per-batch metrics and the hottest
  * frontier rows. Usage:
  *   runMain graft.CrawlDemo <stateDir> [nDocs=300] [batches=6] [batchSize=40] [query="..."]
  */
object CrawlDemo {
  def main(args: Array[String]): Unit = {
    val stateDir = args.headOption.getOrElse(sys.error("usage: CrawlDemo <stateDir> [nDocs] [batches] [batchSize] [query]"))
    val nDocs = args.lift(1).map(_.toInt).getOrElse(300)
    val batches = args.lift(2).map(_.toInt).getOrElse(6)
    val batchSize = args.lift(3).map(_.toInt).getOrElse(40)
    val query = args.lift(4)
    val seed = 42L

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-crawl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.adaptive.enabled", "true")
      // keep the politeness top-k hash-based with many hosts per task
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "8000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = CrawlConfig(batchSize = batchSize, perHostCap = 4,
      maxBatches = batches, nBuckets = 8, saltBuckets = 4, minTokens = 50,
      indexWhileCrawling = query.isDefined)

    val res = CrawlLoop.run(spark,
      Corpus.documents(spark, seed, nDocs).toDF(),
      Corpus.robots(spark).toDF(),
      Corpus.seedsDs(spark, nDocs).toDF(),
      cfg, stateDir, seed, nDocs)

    println(f"${"batch"}%5s ${"popped"}%7s ${"denied"}%7s ${"fetched"}%8s ${"links"}%7s ${"dups"}%6s ${"fresh"}%6s ${"frontier"}%9s ${"ms"}%6s")
    res.batches.foreach { m =>
      println(f"${m.batch}%5d ${m.popped}%7d ${m.robotsDenied}%7d ${m.fetched}%8d ${m.linksAdmitted}%7d ${m.duplicateHits}%6d ${m.freshUrls}%6d ${m.frontierSize}%9d ${m.elapsedMs}%6d")
    }
    val manifest = Snapshots.readCurrent(stateDir).get
    println(s"\nmanifest: batch=${manifest.batch} phase=${manifest.phase} buckets=${manifest.perBucketRows.size}")
    println("\ntop frontier entries by priority:")
    Snapshots.readFrontier(spark, manifest.bucketPaths)
      .orderBy(org.apache.spark.sql.functions.col("priority").desc).limit(8).show(false)

    query.foreach { q =>
      // search the index the crawl built live (one epoch per superstep).
      // If no superstep indexed anything (all docs under minTokens / zero ok
      // fetches) the sink dirs hold no parquet files and schema inference
      // fails — report that instead of crashing.
      try {
        val postings = spark.read.parquet(Snapshots.postingsPath(stateDir))
        val docmeta = spark.read.parquet(Snapshots.docmetaPath(stateDir))
        println(s"\nsearch: '$q' (over ${docmeta.count()} crawled+indexed docs)")
        Search.search(spark, postings, docmeta, q, topK = 10, termCountGate = 0).show(false)
      } catch {
        case _: org.apache.spark.sql.AnalysisException =>
          println(s"\nsearch: '$q' — no documents indexed")
      }
    }
    spark.stop()
  }
}
