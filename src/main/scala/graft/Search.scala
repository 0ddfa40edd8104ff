package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Conjunctive top-k search with the reference's exact integer score math.
  *
  * Reference query path (src/bin/query.rs): per shard, fetch postings for all
  * query terms (ANY missing ⇒ shard skipped — AND semantics), compute integer
  * IDFs and shift denominators, then a SIMD fold that zeroes docs missing a
  * term and accumulates shifted u8 scores; global top-20 min-heap; results
  * gated on term_count >= 8.
  *
  * Spark: postings.filter(term ∈ query) → groupBy(epoch, doc) AND-check →
  * the same fold as a deterministic array fold → TakeOrderedAndProject.
  * Per-term stats (df, max) are a tiny aggregate collected to the driver —
  * exactly the role of compute_idfs/add_scores preambles.
  */
object Search {

  /** Integer score math, shared by the Spark path and unit tests
    * (SURVEY §7.4 risk 5: u32/u8 formulas as Long + clamps). */
  object ScoreMath {
    /** src/bin/query.rs:59-73 */
    def idf(df: Long, shardSize: Long): Long = {
      val normalized = df * 65536L / math.max(shardSize, 1L)
      val logIdf = 64 - java.lang.Long.numberOfLeadingZeros(normalized) // 0 when normalized==0
      1L << (logIdf / 2)
    }

    /** shift = position of next_power_of_two(d)'s bit (src/bin/query.rs:78) */
    def shiftOf(d: Long): Int = {
      val np = java.lang.Long.highestOneBit(math.max(d, 1L))
      val npow = if (np == d) d else np << 1
      63 - java.lang.Long.numberOfLeadingZeros(npow)
    }

    /** Per-shard shift vector for query terms, given (df, max) per term
      * (src/bin/query.rs:119-136 add_scores preamble). */
    def shifts(dfs: Seq[Long], maxs: Seq[Long], shardSize: Long): Seq[Int] = {
      val idfs0 = dfs.map(idf(_, shardSize))
      val minIdf = idfs0.min
      val idfs = idfs0.map(_ / minIdf)
      val termMaxs = maxs.zip(idfs).map { case (m, i) => m / i }
      val denominator = termMaxs.sum / 255L + 1L
      idfs.map(i => shiftOf(i * denominator))
    }

    /** The u8 SIMD fold (src/bin/query.rs:75-104): base = last term's shifted
      * score; for each earlier term in order: zero the doc if its shifted
      * posting is zero, else accumulate with wrapping u8 addition. */
    def fold(scores: Seq[Int], shiftVec: Seq[Int]): Int = {
      var s = (scores.last >> shiftVec.last) & 0xff
      var t = 0
      while (t < scores.length - 1) {
        val p = (scores(t) >> shiftVec(t)) & 0xff
        if (p == 0) s = 0
        else if (s != 0) s = (s + p) & 0xff
        t += 1
      }
      s
    }
  }

  /** Whitespace split + lowercase (src/bin/query.rs:294-299). */
  def splitQuery(q: String): Seq[String] =
    q.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase).toSeq

  /** Top-k conjunctive query over (postings, docmeta).
    * `termCountGate` is the reference's `term_counts[id] >= 8`
    * (src/bin/query.rs:97) — parameterized because small test corpora have
    * log2(doc length) < 8.
    *
    * Fully distributed: per-shard stats (A6 df + A7 max) and the per-shard
    * shift vectors are TINY DataFrames (≤ |epochs|·|terms| rows) that
    * broadcast-join back into the postings aggregate — no driver collect
    * anywhere before the final top-k action, so the plan holds when epoch
    * count reaches thousands. */
  def search(spark: SparkSession, postings: DataFrame, docmeta: DataFrame,
             query: String, topK: Int = 20, termCountGate: Int = 8): DataFrame =
    searchWithScanCount(spark, postings, docmeta, query, topK, termCountGate)._1

  /** [[search]] plus the reference's result-page `count`: the number of
    * docs SCANNED = shard size × shards that held every query term — the
    * reference accumulates `count += SHARD_SIZE * shards_scored`
    * (src/bin/query.rs:158-172,260-263; every doc of a participating shard
    * goes through the scoring fold, zeros included). Returned as a one-row
    * frame (`scanned_docs` bigint, 0 when no shard participates) so the
    * caller picks when to pay the action; it re-aggregates only the
    * term-filtered postings slice — the same tiny preamble the shift
    * vectors need. */
  def searchWithScanCount(spark: SparkSession, postings: DataFrame,
      docmeta: DataFrame, query: String, topK: Int = 20,
      termCountGate: Int = 8): (DataFrame, DataFrame) = {
    val terms = splitQuery(query)
    require(terms.nonEmpty, "empty query")
    val termsD = terms.distinct
    val nTerms = termsD.size

    val qPostings = postings.filter(col("term").isin(termsD: _*))

    val shardSizes = docmeta.groupBy(col("epoch"))
      .agg(count(lit(1)).as("shard_size"))
    // shards missing any query term are skipped entirely (AND semantics,
    // src/bin/query.rs:163-170): the nt === nTerms filter + inner joins
    // below drop them without any driver-side decision
    val epochStats = qPostings.groupBy(col("epoch"), col("term")).agg(
        count(when(col("score") > 0, 1)).as("df"),
        max(col("score")).cast("long").as("mx"))
      .groupBy(col("epoch")).agg(
        map_from_entries(collect_list(struct(col("term"), col("df")))).as("dfs"),
        map_from_entries(collect_list(struct(col("term"), col("mx")))).as("mxs"),
        count(lit(1)).as("nt"))
      .filter(col("nt") === nTerms)
      .join(shardSizes, Seq("epoch"))

    val termsB = terms
    val shiftsUdf = udf((dfs: Map[String, Long], mxs: Map[String, Long],
        shardSize: Long) =>
      ScoreMath.shifts(termsB.map(dfs), termsB.map(mxs), shardSize))
    val epochShifts = epochStats.select(col("epoch"),
      shiftsUdf(col("dfs"), col("mxs"), col("shard_size")).as("shifts"))

    val foldUdf = udf((m: Map[String, Int], sh: Seq[Int]) =>
      ScoreMath.fold(termsB.map(t => m.getOrElse(t, 0)), sh))

    val perDoc = qPostings
      .groupBy(col("epoch"), col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("term"), col("score")))).as("m"),
        countDistinct(col("term")).as("nt"))
      .filter(col("nt") === nTerms) // conjunctive AND (J4)
      .join(broadcast(epochShifts), Seq("epoch")) // inner: skipped shards drop
      .withColumn("score", foldUdf(col("m"), col("shifts")))
      .filter(col("score") > 0)
      .select("epoch", "doc_id", "score")

    val results = perDoc
      .join(docmeta, Seq("epoch", "doc_id")) // J5: url lookup for winners
      .filter(col("term_count") >= termCountGate) // F10
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
      .select(col("url"), col("score"), col("term_count"))
    val scanned = epochStats
      .agg(coalesce(sum(col("shard_size")), lit(0L)).as("scanned_docs"))
    (results, scanned)
  }
}
