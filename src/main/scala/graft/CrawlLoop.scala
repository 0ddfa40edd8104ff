package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The crawl as deterministic BSP supersteps (replacing the reference's
  * actor/channel feedback loop, SURVEY §2.9 ST2):
  *
  *   pop → commit popbatch → robots gate → fetch join → parse/extract →
  *   frontier merge (insert-or-increment + popped marking) → seen-filter
  *   update → snapshot commit (+ metrics, per-bucket lineage)
  *
  * Terminates when a pop batch comes back empty (ST4's analog) or after
  * cfg.maxBatches. Each superstep's frontier is re-read from its committed
  * parquet snapshot, which (a) keeps the plan lineage flat across arbitrarily
  * many supersteps, and (b) makes every superstep resumable for free.
  */
object CrawlLoop {

  final case class CrawlResult(batches: Seq[BatchMetrics], stateDir: String) {
    def totalPopped: Long = batches.map(_.popped).sum
    def totalLinks: Long = batches.map(_.linksAdmitted).sum
  }

  /** Run (or resume) a crawl. `documents`/`robots` are the corpus tables;
    * `seeds` only seeds batch 0 of a fresh run. */
  def run(
      spark: SparkSession,
      documents: DataFrame,
      robots: DataFrame,
      seeds: DataFrame,
      cfg: CrawlConfig,
      stateDir: String,
      seed: Long = 42L,
      nDocs: Int = 0,
      maintainFilters: Boolean = true): CrawlResult = {

    import Snapshots._

    val metricsOut = Seq.newBuilder[BatchMetrics]
    var batch = 0
    var frontier: DataFrame = null
    var pendingPop: Option[DataFrame] = None
    var filtersPath: String = ""

    readCurrent(stateDir) match {
      case Some(m) =>
        // resume from checkpoint: the manifest names the committed frontier
        // and (if the crash hit mid-superstep) the already-popped batch.
        metricsOut ++= readMetrics(spark, stateDir)
        frontier = spark.read.parquet(m.frontierPath)
        filtersPath = m.filtersPath
        if (m.phase == "pop") {
          batch = m.batch
          pendingPop = Some(spark.read.parquet(m.popBatchPath))
        } else {
          batch = m.batch + 1
        }
      case None =>
        frontier = Frontier.fromSeeds(spark, seeds, cfg)
        val p = frontierPath(stateDir, -1)
        frontier.write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(p)
        frontier = spark.read.parquet(p)
    }

    val t0 = System.nanoTime()
    var done = false
    while (!done && batch < cfg.maxBatches) {
      val tb = System.nanoTime()

      // ---- phase 1: pop + commit (politeness window boundary) ----
      val pop = pendingPop match {
        case Some(p) => p
        case None =>
          val p = Frontier.popBatch(frontier, cfg)
          p.write.mode(SaveMode.Overwrite).parquet(popBatchPath(stateDir, batch))
          val committed = spark.read.parquet(popBatchPath(stateDir, batch))
          Snapshots.commit(stateDir, Manifest(
            batch, "pop",
            frontierPath = if (batch == 0) frontierPath(stateDir, -1) else frontierPath(stateDir, batch - 1),
            popBatchPath = popBatchPath(stateDir, batch),
            filtersPath = filtersPath, perBucketRows = Map.empty,
            metrics = None, seed = seed, nDocs = nDocs))
          committed
      }
      pendingPop = None
      // `popped` counts the pop batch itself, BEFORE any join: a robots table
      // with an (invalid) multi-row host must never inflate the metric. The
      // batch is bounded by nBuckets * ceil(batchSize / nBuckets) — a
      // per-bucket-rounded target, not a hard cap (Frontier.perBucketBudget).
      val popped = pop.persist().count()
      if (popped == 0) { done = true }
      else {
        // ---- phase 2: robots gate → fetch → parse ----
        // One corpus scan per superstep: the fetch join materializes once
        // (≤ batch-budget rows), and matched/fetched stats + the ok-HTML
        // subset all come from that cache instead of re-scanning the corpus.
        val allowed = Robots.allowedBatch(pop, robots)
        val allowedCount = allowed.count()
        val fetchedAll = Fetcher.fetch(allowed, documents).persist()
        val fetchStats = fetchedAll.agg(
          count(lit(1)).as("matched"),
          count(when(col("status") >= 200 && col("status") < 300 &&
            col("content_type").startsWith("text/html"), 1)).as("fetched")).first()
        val matched = fetchStats.getLong(0)
        val fetched = fetchStats.getLong(1)
        val ok = Fetcher.okHtml(fetchedAll)
        val robotsDenied = popped - allowedCount
        val fetchErrors = allowedCount - matched

        // optional live indexing (reference indexes while crawling,
        // src/main.rs:256-280): each superstep is one index epoch, appended
        // to the shared postings/docmeta tables
        if (cfg.indexWhileCrawling) {
          val (postings, docmeta) = Indexer.index(ok, cfg, epoch = batch)
          Indexer.writePostings(postings, Snapshots.postingsPath(stateDir))
          Indexer.writeDocmeta(docmeta, Snapshots.docmetaPath(stateDir))
        }

        val links = Parser.linksOf(ok, cfg).persist()
        val linksAdmitted = links.count()

        // ---- phase 3: frontier merge + metrics in one pass ----
        // (merge hash-aggregates the raw link stream itself, map-side)
        val merged = Frontier.merge(frontier, links, pop, cfg).persist()
        val byBucket = merged.groupBy(col("bucket")).agg(
          count(lit(1)).as("rows"),
          sum(when(col("was_existing") === 1 && col("was_incoming") === 1, 1L)
            .otherwise(0L)).as("dups"),
          sum(when(col("was_existing") === 0 && col("was_incoming") === 1, 1L)
            .otherwise(0L)).as("fresh")).collect()
        val frontierSize = byBucket.map(_.getLong(1)).sum
        val duplicateHits = byBucket.map(_.getLong(2)).sum
        val freshUrls = byBucket.map(_.getLong(3)).sum
        val perBucketRows = byBucket.map(r => r.getInt(0).toString -> r.getLong(1)).toMap

        // Cluster the snapshot by bucket before the partitioned write: without
        // this, every one of the P write tasks emits a file into all 64 bucket
        // dirs (P*64 small files per superstep); with it, each bucket lands in
        // exactly one file — the same layout a real cluster wants for
        // co-located frontier reads.
        val newFrontier = merged.select("url", "host", "bucket", "priority", "popped")
          .repartition(col("bucket"))
        val fPath = frontierPath(stateDir, batch)
        newFrontier.write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(fPath)

        // ---- phase 4: incremental seen-filter update (bloom + cuckoo) ----
        val newFiltersPath = Snapshots.filtersPath(stateDir, batch)
        if (maintainFilters) {
          val freshUrlsDf = merged
            .filter(col("was_existing") === 0)
            .select(col("url"), col("bucket"))
          val built = SeenSet.buildFilters(freshUrlsDf,
            expectedPerBucket = math.max(1024L, 4L * cfg.batchSize / cfg.nBuckets))
          val updated =
            if (filtersPath.isEmpty) built
            else SeenSet.mergeFilterTables(spark.read.parquet(filtersPath), built)
          updated.write.mode(SaveMode.Overwrite).parquet(newFiltersPath)
          filtersPath = newFiltersPath
        }

        val m = BatchMetrics(
          batch = batch, popped = popped, robotsDenied = robotsDenied,
          fetched = fetched, fetchErrors = fetchErrors,
          linksExtracted = linksAdmitted, linksAdmitted = linksAdmitted,
          duplicateHits = duplicateHits, freshUrls = freshUrls,
          frontierSize = frontierSize,
          elapsedMs = (System.nanoTime() - tb) / 1000000L)
        metricsOut += m

        Snapshots.commit(stateDir, Manifest(
          batch, "done", frontierPath = fPath,
          popBatchPath = popBatchPath(stateDir, batch),
          filtersPath = filtersPath,
          perBucketRows = perBucketRows, metrics = Some(m),
          seed = seed, nDocs = nDocs))

        pop.unpersist(); fetchedAll.unpersist(); links.unpersist(); merged.unpersist()
        frontier = spark.read.parquet(fPath)
        batch += 1
      }
    }
    val _ = t0
    CrawlResult(metricsOut.result(), stateDir)
  }

  /** Per-batch metrics live in the committed manifest history (one JSON per
    * superstep commit — north_rule: metrics committed to snapshots); no
    * separate per-batch parquet write job. [[metricsTable]] materializes the
    * history as a DataFrame on demand. */
  def readMetrics(spark: SparkSession, root: String): Seq[BatchMetrics] =
    Snapshots.readMetricsHistory(root)

  def metricsTable(spark: SparkSession, root: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    readMetrics(spark, root).toDF()
  }
}
