package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The crawl as deterministic BSP supersteps (replacing the reference's
  * actor/channel feedback loop, SURVEY §2.9 ST2):
  *
  *   pop → commit popbatch → robots gate → fetch join → parse/extract →
  *   bloom split (definitely-fresh links skip the frontier join) →
  *   frontier merge over the CHANGED-bucket slice only →
  *   delta snapshot commit (+ metrics, per-bucket lineage) →
  *   seen-filter update
  *
  * Terminates when a pop batch comes back empty (ST4's analog) or after
  * cfg.maxBatches. Each superstep's frontier is re-read from its committed
  * parquet snapshot, which (a) keeps the plan lineage flat across arbitrarily
  * many supersteps, and (b) makes every superstep resumable for free.
  *
  * Scale shape per superstep (the 10^10-row frontier budget):
  *  - the pop is partition-parallel (no global sort, Frontier.popBatch);
  *  - links probe the per-bucket Bloom filters as a NARROW map
  *    (SeenSet.probeBloom — one deserialize per partition-bucket, the
  *    reference's seen-check at src/main-old.rs:190-196): definitely-fresh
  *    links never join the frontier at all;
  *  - the merge joins only the buckets links/pops actually touched
  *    (partition-pruned scan), and only those buckets are rewritten —
  *    snapshot IO is O(delta), the dirty-page analog of
  *    src/pqueuethread.rs:58-87. Unchanged buckets carry forward by
  *    reference in the manifest's bucketPaths.
  */
object CrawlLoop {

  final case class CrawlResult(batches: Seq[BatchMetrics], stateDir: String) {
    def totalPopped: Long = batches.map(_.popped).sum
    def totalLinks: Long = batches.map(_.linksAdmitted).sum
  }

  private def filterCapacity(cfg: CrawlConfig): Long =
    math.max(1024L, 4L * cfg.batchSize / cfg.nBuckets)

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
    var pendingPop: Option[DataFrame] = None
    var filtersPath: String = ""
    var bucketPaths: Map[String, String] = Map.empty
    var perBucket: Map[String, Long] = Map.empty

    // one row per host, whatever the input shape: a (malformed) multi-row
    // host must neither inflate counts nor duplicate rows through the gate
    val robotsNorm = robots.groupBy(col("host"))
      .agg(flatten(collect_list(col("disallow"))).as("disallow"))

    readCurrent(stateDir) match {
      case Some(m) =>
        // resume from checkpoint: the manifest names the committed per-bucket
        // frontier view and (if the crash hit mid-superstep) the
        // already-popped batch.
        metricsOut ++= readMetrics(spark, stateDir)
        bucketPaths = m.bucketPaths
        perBucket = m.perBucketRows
        filtersPath = m.filtersPath
        if (m.phase == "pop") {
          batch = m.batch
          pendingPop = Some(spark.read.parquet(m.popBatchPath))
        } else {
          batch = m.batch + 1
        }
      case None =>
        val p = frontierPath(stateDir, -1)
        Frontier.fromSeeds(spark, seeds, cfg)
          .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(p)
        val counts = spark.read.parquet(p).groupBy(col("bucket")).count().collect()
        perBucket = counts.map(r => r.getInt(0).toString -> r.getLong(1)).toMap
        bucketPaths = perBucket.keys.map(_ -> p).toMap
    }

    var frontier = readFrontier(spark, bucketPaths)
    if (maintainFilters && filtersPath.isEmpty) {
      // Bootstrap the seen filters from the CURRENT frontier (fresh run:
      // the seeds; resume of a filter-less state dir: everything). The
      // filters' membership invariant is "every url ever inserted into the
      // frontier" — the Bloom split relies on it: a url missing from the
      // filters is treated as definitely-fresh and would be duplicated.
      val p0 = Snapshots.filtersPath(stateDir, batch - 1)
      SeenSet.buildFilters(frontier.select("url", "bucket"),
          expectedPerBucket = filterCapacity(cfg))
        .write.mode(SaveMode.Overwrite).parquet(p0)
      filtersPath = p0
    }
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
            frontierPath = "",
            popBatchPath = popBatchPath(stateDir, batch),
            filtersPath = filtersPath, bucketPaths = bucketPaths,
            perBucketRows = perBucket,
            metrics = None, seed = seed, nDocs = nDocs))
          committed
      }
      pendingPop = None
      // popped + robots-allowed + pop-touched buckets in ONE job over the
      // (tiny, ≤ nBuckets·ceil(batchSize/nBuckets)-row) committed pop batch.
      val popStats = pop.persist()
        .join(broadcast(robotsNorm), Seq("host"), "left")
        .withColumn("path", Robots.pathCol(col("url")))
        .agg(count(lit(1)).as("popped"),
          count(when(col("disallow").isNull ||
            !exists(col("disallow"), p => col("path").startsWith(p)), 1)).as("allowed"),
          collect_set(col("bucket")).as("buckets"))
        .first()
      val popped = popStats.getLong(0)
      val allowedCount = popStats.getLong(1)
      val popBuckets = popStats.getSeq[Int](2)
      if (popped == 0) { done = true }
      else {
        // ---- phase 2: robots gate → fetch → parse ----
        // One corpus scan per superstep: the fetch join materializes once
        // (pop-batch-bounded rows), and matched/fetched stats + the ok-HTML
        // subset all come from that cache instead of re-scanning the corpus.
        val allowed = Robots.allowedBatch(pop, robotsNorm)
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
        // src/main.rs:256-280): each superstep is one index epoch, written
        // idempotently (dynamic partition overwrite) to the shared tables
        if (cfg.indexWhileCrawling) {
          val (postings, docmeta) = Indexer.index(ok, cfg, epoch = batch)
          Indexer.writePostings(postings, Snapshots.postingsPath(stateDir))
          Indexer.writeDocmeta(docmeta, Snapshots.docmetaPath(stateDir))
        }

        val links = Parser.linksOf(ok, cfg)
          .withColumn("bucket", Frontier.bucketCol(col("url"), cfg.nBuckets))
          .persist()
        val linkBuckets = links.select(col("bucket")).distinct()
          .collect().map(_.getInt(0))

        // ---- phase 3: delta merge over the changed-bucket slice ----
        // Only buckets a link landed in or a pop touched can change; the
        // rest of the frontier is neither read by the join nor rewritten.
        val changed = (linkBuckets ++ popBuckets).distinct.toSeq
        val frontierSlice = frontier.filter(col("bucket").isin(changed: _*))

        val merged = (if (maintainFilters && filtersPath.nonEmpty) {
          // Bloom split (no false negatives): definitely-fresh links become
          // new frontier rows directly — they cannot be in the frontier, so
          // they skip the outer join; probably-seen links (incl. Bloom false
          // positives) go through the exact merge and resolve correctly.
          val filters = spark.read.parquet(filtersPath)
          val (seenish, fresh) = SeenSet.splitByBloom(links, filters)
          val mergedSeen = Frontier.merge(frontierSlice, seenish, pop, cfg)
          val freshRows = fresh.groupBy(col("url"))
            .agg(sum(col("weight")).cast("long").as("priority"),
              max(col("host")).as("host"),
              count(lit(1)).as("n_links"),
              first(col("bucket")).as("bucket"))
            .select(col("url"), col("host"), col("priority"),
              lit(false).as("popped"), lit(0).as("was_existing"),
              lit(1).as("was_incoming"), col("n_links"), col("bucket"))
          mergedSeen.unionByName(freshRows)
        } else {
          Frontier.merge(frontierSlice, links, pop, cfg)
        }).persist()

        // per-bucket lineage + all link/dup metrics from ONE pass over the
        // merged slice (n_links carries the raw link count — no separate
        // count job over the link stream)
        val byBucket = merged.groupBy(col("bucket")).agg(
          count(lit(1)).as("rows"),
          sum(when(col("was_existing") === 1 && col("was_incoming") === 1, 1L)
            .otherwise(0L)).as("dups"),
          sum(when(col("was_existing") === 0 && col("was_incoming") === 1, 1L)
            .otherwise(0L)).as("fresh"),
          sum(col("n_links")).as("nlinks")).collect()
        val duplicateHits = byBucket.map(_.getLong(2)).sum
        val freshUrls = byBucket.map(_.getLong(3)).sum
        val linksAdmitted = byBucket.map(_.getLong(4)).sum
        perBucket = perBucket ++
          byBucket.map(r => r.getInt(0).toString -> r.getLong(1)).toMap
        val frontierSize = perBucket.values.sum

        // Delta snapshot: rewrite ONLY the changed buckets, clustered so each
        // bucket lands in exactly one file; unchanged buckets keep their
        // previous dirs by reference in bucketPaths.
        val fPath = frontierPath(stateDir, batch)
        merged.select("url", "host", "bucket", "priority", "popped")
          .repartition(col("bucket"))
          .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(fPath)
        bucketPaths = bucketPaths ++
          byBucket.map(r => r.getInt(0).toString -> fPath).toMap

        // ---- phase 4: incremental seen-filter update (bloom + cuckoo) ----
        if (maintainFilters) {
          val newFiltersPath = Snapshots.filtersPath(stateDir, batch)
          val freshUrlsDf = merged
            .filter(col("was_existing") === 0)
            .select(col("url"), col("bucket"))
          val built = SeenSet.buildFilters(freshUrlsDf,
            expectedPerBucket = filterCapacity(cfg))
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
          filtersPath = filtersPath, bucketPaths = bucketPaths,
          perBucketRows = perBucket, metrics = Some(m),
          seed = seed, nDocs = nDocs))

        pop.unpersist(); fetchedAll.unpersist(); links.unpersist(); merged.unpersist()
        frontier = readFrontier(spark, bucketPaths)
        batch += 1
      }
    }
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
