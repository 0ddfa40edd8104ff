package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.MultiModal

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` = one entry per implemented operator (SURVEY §2 + the
  * training-data pipeline ops); every SQL-expressible one has a DuckDB twin
  * in `oracleSql` (the driver's correctness gate). The two remaining
  * rows-only entries (full crawl superstep q33, sketch-filter membership
  * q35) have no ANSI-SQL equivalent — Java URI resolution and cuckoo-filter
  * internals are not expressible — and are instead verified by ScalaTest
  * against the sequential reference oracle (CrawlEngineSpec); the
  * superstep's SQL-expressible tail is oracle-checked as q41_superstep_tail.
  */
object SparkEntry {

  /** Flagship: one full crawl superstep (pop → robots → fetch-join → parse →
    * frontier merge) on the deterministic synthetic web. Driver smoke-checks
    * rows > 0. */
  def entry(spark: SparkSession): DataFrame = crawlSuperstep(spark, nDocs = 300)

  private def crawlSuperstep(spark: SparkSession, nDocs: Int): DataFrame = {
    val cfg = CrawlConfig(batchSize = 60, perHostCap = 4, nBuckets = 8,
      saltBuckets = 4, minTokens = 50)
    val docs = Corpus.documents(spark, 42L, nDocs).toDF()
    val robots = Corpus.robots(spark).toDF()
    val frontier = Frontier.fromSeeds(spark, Corpus.seedsDs(spark, nDocs).toDF(), cfg)
    val pop = Frontier.popBatch(frontier, cfg)
    val allowed = Robots.allowedBatch(pop, robots)
    val fetched = Fetcher.okHtml(Fetcher.fetch(allowed, docs))
    val links = Parser.linksOf(fetched, cfg)
    val linkAgg = links.groupBy(col("url"), col("host"))
      .agg(sum(col("weight")).as("weight"))
    Frontier.merge(frontier, linkAgg, pop.select("url", "host"), cfg)
      .select("url", "host", "priority", "popped")
  }

  /** Rows-only queries (no ANSI-SQL equivalent; see class doc). */
  private def rowsOnlyQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // full BSP superstep incl. RFC-3986 resolution + trap page-ANY gate
    // (its SQL-expressible tail — admission → weight → merge — is
    // oracle-checked as q41_superstep_tail)
    "q33_crawl_superstep" -> ((s, _) => crawlSuperstep(s, nDocs = 300)),

    // partitioned bloom+cuckoo seen-set: fresh/seen split counts per bucket
    "q35_seen_filters" -> ((s, d) => {
      val u = QueriesCrawl.urls(s, d)
        .withColumn("bucket", Frontier.bucketCol(col("url"), 16))
      val half = u.filter(col("doc_id") % 2 === 0).select("url", "bucket")
      val filters = SeenSet.buildFilters(half)
      val (seenish, fresh) = SeenSet.splitByBloom(u.select("url", "bucket"), filters)
      seenish.groupBy(col("bucket")).agg(count(lit(1)).as("n_seenish"))
        .join(fresh.groupBy(col("bucket")).agg(count(lit(1)).as("n_fresh")),
          Seq("bucket"), "full")
    }))

  /** Multimodal decode queries. The stub codec's byte fold
    * (acc*31 + byte over UTF-8 payload bytes, ops/MultiModal.scala) IS
    * ANSI-expressible, so these get full DuckDB oracles: the SQL replays
    * the fold with HUGEINT modular arithmetic over the text's code points
    * (the synthetic corpus is pure ASCII, so code points == UTF-8 bytes —
    * asserted cheaply by the oracle itself: octet_length(encode(text)) would
    * differ from length(text) otherwise and the width/height values would
    * mismatch loudly). */
  private def mediaQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // multimodal decode + feature extraction (stub codec, real plumbing)
    "q36_media_features" -> ((s, d) => {
      val assets = MultiModal.assetsFromText(
        s.read.parquet(s"$d/documents.parquet"), "doc_id", "text")
      MultiModal.extractFeatures(s, assets).toDF()
    }),

    // video frame sampling plan (explode bounded by n_frames)
    "q37_frame_sample" -> ((s, d) => {
      val assets = MultiModal.assetsFromText(
        s.read.parquet(s"$d/documents.parquet"), "doc_id", "text")
      val features = MultiModal.extractFeatures(s, assets).toDF()
      MultiModal.sampleFrames(features, everyN = 30)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sampled"))
    }))

  /** DuckDB twins of the stub-codec fold: h = (fold of acc*31+byte mod 2^64
    * from 1125899906842597) masked to 63 bits; dims/frames/luma are shifted
    * slices of h (floor-div == >> for non-negative HUGEINT). */
  private val sqlStubHashCte: String =
    "f AS (SELECT doc_id, " +
      "(['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind, " +
      "list_reduce(list_prepend(1125899906842597::HUGEINT, " +
      "list_transform(string_split_regex(text, ''), c -> unicode(c)::HUGEINT)), " +
      "(acc, x) -> (acc * 31 + x) % 18446744073709551616::HUGEINT) " +
      "% 9223372036854775808::HUGEINT AS h FROM documents)"

  private def mediaOracleSql: Map[String, String] = Map(
    "q36_media_features" ->
      (s"WITH $sqlStubHashCte " +
        "SELECT doc_id, kind, CAST(16 + h % 1024 AS INT) AS width, " +
        "CAST(16 + (h // 1024) % 1024 AS INT) AS height, " +
        "CAST(CASE kind WHEN 'video' THEN 1 + (h // 1048576) % 300 " +
        "WHEN 'audio' THEN 1 + (h // 1048576) % 48000 ELSE 1 END AS INT) AS n_frames, " +
        "CAST((h // 4294967296) % 1000000 AS BIGINT) AS mean_luma_micro FROM f"),

    "q37_frame_sample" ->
      (s"WITH $sqlStubHashCte " +
        "SELECT doc_id, CAST(((1 + (h // 1048576) % 300) - 1) // 30 + 1 AS BIGINT) AS n_sampled " +
        "FROM f WHERE kind = 'video'"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCrawl.queries ++ QueriesData.queries ++ mediaQueries ++ rowsOnlyQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for the rows-only entries. */
  def oracleSql: Map[String, String] =
    QueriesCrawl.oracleSql ++ QueriesData.oracleSql ++ mediaOracleSql
}
