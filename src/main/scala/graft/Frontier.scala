package graft

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** The URL frontier as a typed, hash-bucketed Dataset.
  *
  * Reference: 64 disk-backed priority queues of sorted (url, count, popped)
  * pages (src/pqueue.rs, src/page.rs). Relationally the whole structure is
  * one table `frontier(url, host, bucket, priority, popped)`:
  *   - the B-tree page/range machinery (src/pagebounds.rs) is storage — it
  *     becomes hash bucketing + parquet min/max pruning;
  *   - the per-page `value` (max un-popped count, src/page.rs:82-88) is only
  *     needed transiently at pop time — a window max;
  *   - insert-or-increment (src/pqueue.rs:153-185, src/page.rs:30-51) is a
  *     union + groupBy(url) merge with `popped` surviving via max().
  */
object Frontier {

  /** Frontier shard routing: reference hashes url → 64 pqueues
    * (src/main.rs:322-325); we standardize on xxhash64 (SURVEY §2.3 L6). */
  def bucketCol(url: Column, nBuckets: Int): Column =
    pmod(xxhash64(url), lit(nBuckets)).cast("int")

  def empty(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[FrontierEntry].toDF()
  }

  /** Seed injection (reference: inc_url(root_set, 1), src/main.rs:337-339). */
  def fromSeeds(spark: SparkSession, seeds: DataFrame, cfg: CrawlConfig): DataFrame =
    seeds.select(
      col("url"),
      UrlOps.hostCol(col("url")).as("host"),
      bucketCol(col("url"), cfg.nBuckets).as("bucket"),
      col("weight").cast("long").as("priority"),
      lit(false).as("popped"))

  /** Insert-or-increment merge of one batch of links + pop markers.
    *
    * Exactly the reference's A1 semantics (src/page.rs:30-51):
    *   - existing url: priority += sum(weights) — even when popped;
    *   - new url: inserted with priority = sum(weights), popped = false;
    *   - popped entries NEVER lose their flag, so re-discovered URLs are
    *     never re-fetched (SURVEY §7.4 risk 2).
    *
    * Shape: pop markers LEFT-join onto the url-unique frontier side FIRST
    * (same join key, so the marker join rides the exchange the outer join
    * needs anyway), raw links hash-aggregate per url (map-side partial —
    * the only shuffle of the link stream), then ONE full-outer join.
    * Exactly three exchanges, none of them over the merged output: joining
    * the markers AFTER the outer join would re-shuffle the whole merged
    * slice per superstep, because the outer join's coalesce(url, url)
    * output key erases the child partitioning (plan-pinned in PlanSpec).
    * No forced broadcast anywhere: a politeness window can be hundreds of
    * thousands of urls, and building a broadcast relation is driver-serial
    * — size-based selection (AQE) broadcasts only when actually small.
    *
    * The returned frame carries `was_existing` / `was_incoming` flags so
    * the caller derives the duplicate-hit / fresh-URL metrics
    * (src/monitor.rs:57-59) from the same pass — no extra join.
    *
    * PRECONDITION: every url in `poppedUrls` must already exist in
    * `frontier`. Markers join the frontier side only, so a marker for an
    * unknown url is silently dropped (no tombstone row is created). This
    * holds by construction in the crawl loop — pop batches are drawn from
    * the frontier — but callers feeding external pop markers must pre-union
    * them into `frontier` first.
    */
  def merge(frontier: DataFrame, links: DataFrame, poppedUrls: DataFrame,
            cfg: CrawlConfig): DataFrame = {
    val popMarkers = poppedUrls.select(col("url")).distinct()
      .withColumn("mark_popped", lit(true))
    val existing = frontier.select(
      col("url"), col("host").as("f_host"), col("priority").as("f_priority"),
      col("popped").as("f_popped"), lit(1).as("src_existing"))
      .join(popMarkers, Seq("url"), "left")
      .select(col("url"), col("f_host"), col("f_priority"),
        (col("f_popped") || coalesce(col("mark_popped"), lit(false)))
          .as("f_popped"),
        col("src_existing"))
    val incoming = links
      .groupBy(col("url"))
      .agg(sum(col("weight")).cast("long").as("l_weight"),
        max(col("host")).as("l_host"),
        count(lit(1)).as("l_n"))
      .withColumn("src_incoming", lit(1))
    existing
      .join(incoming, Seq("url"), "full")
      .select(
        col("url"),
        coalesce(col("f_host"), col("l_host")).as("host"),
        (coalesce(col("f_priority"), lit(0L)) + coalesce(col("l_weight"), lit(0L)))
          .as("priority"),
        coalesce(col("f_popped"), lit(false)).as("popped"),
        coalesce(col("src_existing"), lit(0)).as("was_existing"),
        coalesce(col("src_incoming"), lit(0)).as("was_incoming"),
        // raw incoming-link count per url: lets the caller derive the
        // links-extracted metric from the merge pass itself (no extra
        // count job over the link stream)
        coalesce(col("l_n"), lit(0L)).as("n_links"))
      .withColumn("bucket", bucketCol(col("url"), cfg.nBuckets))
  }

  /** Retire frontier entries: clears the `popped` flag for the given urls,
    * making them eligible to pop (and so re-fetch) again — the inverse of
    * the pop marker, i.e. the reference's popped-entry lifecycle
    * (src/page.rs:33-50) extended with expiry for re-crawl. Priority is
    * preserved: the retired entry competes in the politeness window at its
    * accumulated link weight. Rows not named pass through unchanged; urls
    * not present in the frontier are ignored (nothing to retire). */
  def retire(frontier: DataFrame, urls: DataFrame): DataFrame =
    frontier
      .join(urls.select(col("url")).distinct().withColumn("__retire", lit(true)),
        Seq("url"), "left")
      .select(col("url"), col("host"), col("bucket"), col("priority"),
        (col("popped") && !coalesce(col("__retire"), lit(false))).as("popped"))

  /** Pure-Scala twin of [[bucketCol]] (shared with the sequential oracle):
    * Spark's xxhash64 (seed 42) mod nBuckets, non-negative. */
  def bucketOf(url: String, nBuckets: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(url),
      org.apache.spark.sql.types.StringType, 42L)
    java.lang.Math.floorMod(h, nBuckets.toLong).toInt
  }

  /** Per-superstep pop budget for one bucket: ceil(batchSize / nBuckets). */
  def perBucketBudget(cfg: CrawlConfig): Int =
    math.max(1, (cfg.batchSize + cfg.nBuckets - 1) / cfg.nBuckets)

  /** One pop candidate as carried through the per-host politeness top-k. */
  final case class PopCand(url: String, bucket: Int, priority: Long)

  /** Bounded top-k accumulator for the per-host politeness window: keeps
    * the `k` best candidates by (priority desc, url asc), trimming at 2k,
    * so state and shuffle stay O(k) per (host, map partition) REGARDLESS of
    * skew — the hot host's millions of candidate rows collapse to ≤ 2k
    * inside every mapper (map-side partial aggregation), where the window
    * form had to sort them. Exact: any row in the global per-host top-k is
    * in the top-k of every subset containing it, so partial tops compose.
    *
    * Reference analog: each pqueue pops only its page-max entries
    * (src/scheduler.rs:139-147) — the politeness cap is tiny (default 8),
    * which is what makes the bounded buffer the right physical shape.
    *
    * NOTE for session tuning: with many hosts per task, raise
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (default
    * 128 groups) so the aggregation stays hash-based; the sort-based
    * fallback is still correct and still bounds state, it just re-sorts by
    * the grouping key.
    *
    * DEGENERATE-CAP CAVEAT: per-group state is O(min(k, rows-per-mapper)).
    * With a politeness-off cap (k ≈ batch size) the trim never fires and
    * buffers hold each mapper's rows as JVM objects with no spill — unlike
    * a window sort (tungsten external sort underneath, which spills).
    * [[popBatch]] therefore guards IN CODE: caps above
    * `cfg.hostTopKSpillBound` route to the spill-safe salted two-phase
    * window form ([[popBatchWindow]]) instead; result sets are identical
    * (parity-pinned in FrontierSpec). */
  final class HostTopK(k: Int)
      extends Aggregator[PopCand, scala.collection.mutable.ArrayBuffer[PopCand], Seq[PopCand]] {
    type Buf = scala.collection.mutable.ArrayBuffer[PopCand]
    private def better(a: PopCand, b: PopCand): Boolean =
      a.priority > b.priority || (a.priority == b.priority && a.url < b.url)
    private def trim(b: Buf): Buf =
      if (b.length <= k) b
      else { val top = b.sortWith(better).take(k); b.clear(); b ++= top }
    def zero: Buf = scala.collection.mutable.ArrayBuffer.empty
    def reduce(b: Buf, in: PopCand): Buf = {
      b += in; if (b.length >= 2 * k) trim(b) else b
    }
    def merge(a: Buf, b: Buf): Buf = trim(a ++= b)
    def finish(b: Buf): Seq[PopCand] = trim(b).toSeq
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Seq[PopCand]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[PopCand]]()
  }

  /** Pop batch: per-BUCKET top-(B/nBuckets) by (priority desc, url asc),
    * subject to a per-host politeness cap of k (north star: "priority queue
    * re-expressed as a typed Dataset sorted by (priority, host-bucket,
    * fetch-deadline)").
    *
    * The per-bucket budget IS the reference's scheduling fairness: it
    * round-robins over 64 pqueues taking each queue's max-value entry
    * (src/scheduler.rs:139-147), so every shard contributes to every batch.
    * Relationally that is a window top-k per bucket — and unlike a global
    * `orderBy(priority).limit(B)`, it has NO global sort and NO driver-side
    * merge of P×B candidates: every stage is partition-parallel, which is
    * what survives a 10^10-row frontier (raise nBuckets with cluster size).
    *
    * Deterministic re-expression of the reference's racy pop order
    * (SURVEY §7.4 risk 1): within a superstep the pop set is defined by this
    * rule, and the golden oracle implements the identical rule sequentially.
    *
    * Skew + sort avoidance: one hot host can hold most of the frontier
    * (fixture gives it 30%). A plain Window.partitionBy(host) would sort
    * that host's millions of candidates in ONE task; the earlier salted
    * two-phase window bounded the skew but still SORTED the entire unpopped
    * frontier map-side every superstep. The [[HostTopK]] bounded-heap
    * aggregation does neither: map-side partial aggregation collapses every
    * host to ≤ 2·cap candidates inside each mapper (the hot host included),
    * the shuffle carries O(hosts · cap) rows, and nothing ever sorts the
    * full candidate set. The final per-bucket budget window then runs over
    * ≤ hosts·cap survivors — a small input by construction.
    *
    * Physical-form selection: the heap aggregate's per-group buffers live
    * on the JVM heap and do not spill, so it is the right shape exactly
    * when the cap is politeness-sized (the reference's default is 8). A
    * degenerate cap (perHostCap > cfg.hostTopKSpillBound, e.g. a
    * politeness-off run where cap = batch size) routes to the salted
    * two-phase window instead — same result set (FrontierSpec parity),
    * tungsten external sort underneath, so memory stays bounded however
    * large the cap. */
  def popBatch(frontier: DataFrame, cfg: CrawlConfig): DataFrame = {
    val candidates = frontier.filter(!col("popped"))
      .select("url", "host", "bucket", "priority")
    val perHost =
      if (cfg.perHostCap <= cfg.hostTopKSpillBound) {
        val hostTopK = udaf(new HostTopK(cfg.perHostCap))
        candidates
          .groupBy(col("host"))
          .agg(hostTopK(col("url"), col("bucket"), col("priority")).as("top"))
          .select(col("host"), explode(col("top")).as("c"))
          .select(col("c.url").as("url"), col("host"),
            col("c.bucket").as("bucket"), col("c.priority").as("priority"))
      } else popBatchWindowPerHost(candidates, cfg)
    perHost
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("bucket"))
          .orderBy(col("priority").desc, col("url").asc)))
      .filter(col("rk") <= perBucketBudget(cfg)).drop("rk")
  }

  /** The spill-safe per-host politeness top-k (north_rule's "salted
    * repartitioning to defuse hot-host skew"):
    *   phase 1: top-k per (host, salt) with salt = xxhash64(url) % S
    *            → every task sees ≤ 1/S of any host;
    *   phase 2: top-k per host over the ≤ S·k survivors.
    * Exact: any global per-host top-k row is also in its salt's top-k.
    * Each window is a tungsten external sort — bounded memory at ANY cap —
    * at the cost of sorting the full unpopped candidate set map-side, which
    * is why politeness-sized caps prefer the [[HostTopK]] heap form
    * (+25-33% kernel throughput, BENCH.md). */
  private def popBatchWindowPerHost(candidates: DataFrame,
                                    cfg: CrawlConfig): DataFrame = {
    val salted = candidates.withColumn(
      "salt", pmod(xxhash64(col("url"), lit(1)), lit(cfg.saltBuckets)))
    val phase1 = salted
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("host"), col("salt"))
          .orderBy(col("priority").desc, col("url").asc)))
      .filter(col("rk") <= cfg.perHostCap).drop("rk", "salt")
    phase1
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("host"))
          .orderBy(col("priority").desc, col("url").asc)))
      .filter(col("rk") <= cfg.perHostCap).drop("rk")
  }
}
