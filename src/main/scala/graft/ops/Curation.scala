package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline needs
  * AROUND the dedup/similarity family: benchmark-contamination checks,
  * deterministic train/val/test splitting, PII redaction, and Gopher-style
  * repetition signals.
  *
  * Scale design rules shared with [[Dedup]]/[[TextOps]]:
  *  - the benchmark side of the contamination join is tiny by definition
  *    (eval sets are thousands of docs vs the corpus's billions) — it is
  *    broadcast, and the corpus side joins on 8-byte shingle hashes, never
  *    strings, so the only shuffle carries (id, hash) pairs that survive
  *    the broadcast semi-join (usually a vanishing fraction);
  *  - splitting is a pure narrow projection (hash threshold), so it
  *    composes with any scan without a shuffle and is reproducible across
  *    engines/runs (md5-based, not Math.random);
  *  - redaction is a codegen'd regexp projection (no UDF);
  *  - repetition stats use two-level hash aggregation (map-side partials on
  *    (id, gram) then (id)) — never a per-doc sort and never a
  *    higher-order-function O(n²) rescan of the text.
  *
  * All math is integer micro-units / md5-derived hashes ⇒ every output is
  * bit-reproducible by the DuckDB oracle (driver correctness gate).
  */
object Curation {

  // ---------------------------------------------------------------------
  // Benchmark contamination (n-gram overlap against an eval set)
  // ---------------------------------------------------------------------

  /** Marks corpus docs that share ≥1 word-k-shingle with a benchmark/eval
    * corpus — the standard train/test-contamination sweep (cf. GPT-3
    * appendix C / PaLM's 13-gram overlap decontamination; k is the knob).
    *
    * Output: one row per corpus doc — (id, n_contaminated, contaminated)
    * where n_contaminated = #(distinct shingle hashes shared with ANY
    * benchmark doc) and contaminated = n_contaminated > 0 (as int for
    * oracle portability).
    *
    * Plan shape at 100 TB: benchmark shingle hashes are distinct'd then
    * BROADCAST (an eval suite is ~10^5-10^6 shingles — megabytes); the
    * corpus's (id, hash) stream is filtered by the broadcast inner join
    * before anything shuffles, so the groupBy(id) aggregates only the
    * matching hashes. The final mark rides a left join back onto the
    * corpus ids (nulls → 0). */
  def contaminationMarks(docs: DataFrame, idCol: String, textCol: String,
                         bench: DataFrame, benchTextCol: String,
                         k: Int): DataFrame = {
    val corpusSh = Dedup.hashedShingles(
      Dedup.docShingles(docs, idCol, textCol, k))
    val benchSh = Dedup.docShingles(
        bench.select(lit(0L).as("__bid"), col(benchTextCol).as("__btext")),
        "__bid", "__btext", k)
      .select(TextOps.hash60(col("shingle")).as("h")).distinct()
    val hits = corpusSh
      .join(broadcast(benchSh), "h")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_contaminated"))
    docs.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contaminated",
        (col("n_contaminated") > 0L).cast("long"))
  }

  // ---------------------------------------------------------------------
  // Deterministic train/val/test split
  // ---------------------------------------------------------------------

  /** Split-bucket column: md5-60-bit of "<id>:<salt>" modulo 1,000,000 —
    * a uniform, engine-portable, re-runnable micro-bucket in [0, 1e6). */
  def splitBucketMicro(id: Column, salt: String): Column =
    pmod(TextOps.hash60(concat(id.cast("string"), lit(":" + salt))),
      lit(1000000L))

  /** Deterministic train/val/test assignment by hash threshold — the
    * reproducible alternative to randomSplit (which reshuffles rows and is
    * seed+partitioning dependent). trainMicro/valMicro are the split
    * fractions in micro-units (e.g. 900000/50000 → 90/5/5).
    *
    * Output: (id, bucket_micro, split). Pure narrow projection: composes
    * with any scan, nothing shuffles, and the assignment is stable under
    * repartitioning, resume, and engine choice — the property that matters
    * when the split must be IDENTICAL across preprocessing reruns. */
  def hashSplit(docs: DataFrame, idCol: String, salt: String,
                trainMicro: Long, valMicro: Long): DataFrame = {
    val b = splitBucketMicro(col(idCol), salt)
    docs.select(col(idCol).as("id"), b.as("bucket_micro"))
      .withColumn("split",
        when(col("bucket_micro") < trainMicro, "train")
          .when(col("bucket_micro") < trainMicro + valMicro, "val")
          .otherwise("test"))
  }

  // ---------------------------------------------------------------------
  // PII redaction
  // ---------------------------------------------------------------------

  /** RE2-safe patterns (no backrefs/lookarounds) so the Java-regex engine
    * and the DuckDB oracle match identically. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+[0-9][0-9()\\- ]{6,}[0-9]"

  /** Counts + redacts email addresses and international-format phone
    * numbers. Output columns: n_emails, n_phones, redacted (emails first —
    * a phone-looking digit run inside an email local part is consumed by
    * the email pass, making the two counts disjoint and order-pinned).
    *
    * Counting uses regexp_extract_all (codegen'd) and redaction
    * regexp_replace (replace-all in Spark; the DuckDB twin passes 'g') —
    * no UDF, so the projection whole-stage-compiles and runs at scan
    * speed. At 100 TB this is the shape that matters: PII sweeps touch
    * every byte, so anything off the codegen path dominates the job. */
  def redactPii(text: Column): Seq[(String, Column)] = {
    val afterEmail = regexp_replace(text, emailRe, "<EMAIL>")
    Seq(
      "n_emails" -> size(regexp_extract_all(text, lit(emailRe), lit(0))).cast("long"),
      "n_phones" -> size(regexp_extract_all(afterEmail, lit(phoneRe), lit(0))).cast("long"),
      "redacted" -> regexp_replace(afterEmail, phoneRe, "<PHONE>"))
  }

  // ---------------------------------------------------------------------
  // Token-window chunking (context-window preparation)
  // ---------------------------------------------------------------------

  /** Splits each document's token stream into fixed-size sliding windows —
    * the chunking step that prepares a corpus for a fixed-context model
    * (RAG passage windows, long-doc pretraining shards). `window` tokens
    * per chunk, starts every `stride` tokens (stride < window ⇒ overlap);
    * the final chunk is the first one whose span reaches the last token
    * (shorter than `window` when the doc doesn't divide evenly), and no
    * start is emitted past it.
    *
    * Output: one row per chunk — (id, chunk_idx, start_word, n_tokens,
    * chunk_hash) with chunk_hash = hash60 of the space-joined window, so
    * the oracle pins the exact chunk CONTENT without shipping megabytes of
    * repeated text through the correctness gate.
    *
    * Plan shape at 100 TB: a narrow projection + explode — NO shuffle, no
    * window function, no state; chunking composes with the scan and
    * parallelizes per-document. The starts array is O(n_words / stride). */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    val n = size(col("__ws"))
    // last start S satisfies S + window - 1 >= n_words; with
    // stride <= window this is exactly sequence(1, n - window + stride)
    // clamped up to 1 (short docs get one whole-doc chunk)
    val starts = sequence(lit(1),
      greatest(n - lit(window) + lit(stride), lit(1)), lit(stride))
    docs.select(col(idCol).as("id"), TextOps.words(col(textCol)).as("__ws"))
      .where(size(col("__ws")) >= 1)
      .select(col("id"), col("__ws"), posexplode(starts).as(Seq("__i", "__s")))
      .select(col("id"),
        col("__i").cast("long").as("chunk_idx"),
        col("__s").cast("long").as("start_word"),
        slice(col("__ws"), col("__s"), lit(window)).as("__chunk"))
      .select(col("id"), col("chunk_idx"), col("start_word"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        TextOps.hash60(concat_ws(" ", col("__chunk"))).as("chunk_hash"))
  }

  // ---------------------------------------------------------------------
  // Sequence packing (concat-and-cut context assembly)
  // ---------------------------------------------------------------------

  /** GPT-style sequence packing: documents are concatenated in a
    * deterministic order and cut into training sequences of exactly
    * `budget` tokens, documents crossing cut points (the standard packed
    * pretraining layout — the alternative no-split greedy packer is a
    * sequential recurrence that cannot scale past one partition). The
    * concatenation order is (shard, id): each doc is hashed into one of
    * `nShards` deterministic shards and packing runs INDEPENDENTLY per
    * shard, so the window sort is partition-local — at 100 TB you raise
    * nShards until a shard's (id, n_tokens) pairs fit a task, instead of
    * funneling the corpus through one global ordering.
    *
    * Output: one row per (non-empty) doc — (id, shard, n_tokens,
    * begin_tok (its offset in the shard's token stream), seq_first,
    * seq_last (the packed-sequence ids it lands in), n_seqs). Zero-token
    * docs contribute nothing to a packed stream and are dropped.
    *
    * Shuffle budget: ONE exchange on shard (the window partition key);
    * token counting is narrow. All math integer ⇒ oracle-exact. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budget: Long, nShards: Int, salt: String): DataFrame = {
    require(budget >= 1 && nShards >= 1)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
    docs.select(col(idCol).as("id"),
        size(TextOps.words(col(textCol))).cast("long").as("n_tokens"),
        pmod(TextOps.hash60(concat(col(idCol).cast("string"), lit(":" + salt))),
          lit(nShards.toLong)).as("shard"))
      .where(col("n_tokens") > 0L)
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("begin_tok", col("__cum") - col("n_tokens"))
      // integer div (not floor of a double ratio): exact at any corpus size
      .withColumn("seq_first", expr(s"begin_tok div ${budget}L"))
      .withColumn("seq_last", expr(s"(__cum - 1L) div ${budget}L"))
      .select(col("id"), col("shard"), col("n_tokens"), col("begin_tok"),
        col("seq_first"), col("seq_last"),
        (col("seq_last") - col("seq_first") + 1L).as("n_seqs"))
  }

  // ---------------------------------------------------------------------
  // Domain-mixture sampling
  // ---------------------------------------------------------------------

  /** Deterministic per-source downsampling to a target corpus mixture —
    * the "N% of CommonCrawl, all of Wikipedia" knob of a pretraining data
    * recipe. Each doc keeps iff its [[splitBucketMicro]] hash bucket falls
    * under its source's weight (in micro-units: 1e6 = keep all, 0 = drop
    * all), so the sample is uniform WITHIN each source, reproducible
    * across engines/reruns/repartitioning, and composes with [[hashSplit]]
    * via a different salt (independent hashes).
    *
    * Output: (id, key, bucket_micro, weight_micro, kept). Pure narrow
    * projection — no shuffle, no driver state; the weights map is a plan
    * literal (a mixture recipe is dozens of sources, not millions). */
  def mixtureSample(docs: DataFrame, idCol: String, keyCol: String,
                    weightsMicro: Seq[(String, Long)], defaultMicro: Long,
                    salt: String): DataFrame = {
    val wmap = map(weightsMicro.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }: _*)
    docs.select(col(idCol).as("id"), col(keyCol).as("key"),
        splitBucketMicro(col(idCol), salt).as("bucket_micro"))
      .withColumn("weight_micro",
        coalesce(element_at(wmap, col("key")), lit(defaultMicro)))
      .withColumn("kept", (col("bucket_micro") < col("weight_micro")).cast("long"))
  }

  // ---------------------------------------------------------------------
  // Repetition signals (Gopher-style quality filters)
  // ---------------------------------------------------------------------

  /** Per-doc repetition statistics — the Gopher/MassiveText repetition
    * filters re-expressed for a word-stream corpus:
    *
    *  - dup_word_ratio_micro: floor((n_words − n_distinct_words)·1e6 /
    *    n_words) — the fraction of the doc that is repeated vocabulary;
    *  - top_bigram_share_micro: floor(max_bigram_count·1e6 / n_bigrams) —
    *    the share the single most frequent word-bigram occupies (Gopher's
    *    "fraction of characters in most common n-gram", in tokens);
    *
    * both 0 for docs too short to have the unit. Output: (id, n_words,
    * dup_word_ratio_micro, top_bigram_share_micro) — one row per doc.
    *
    * Plan shape: word counts are a narrow projection; the bigram mode runs
    * as explode → groupBy(id, gram) → groupBy(id) (two hash aggregations,
    * map-side partials both levels, the heaviest key is one doc's grams) —
    * never a per-doc sort, never an O(n²) higher-order-function fold, and
    * the left join back onto the doc spine keeps shingle-less docs. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spine = docs.select(col(idCol).as("id"),
        TextOps.words(col(textCol)).as("__ws"))
      .select(col("id"),
        size(col("__ws")).cast("long").as("n_words"),
        size(array_distinct(col("__ws"))).cast("long").as("n_distinct"))
      .withColumn("dup_word_ratio_micro",
        when(col("n_words") > 0L,
          floor((col("n_words") - col("n_distinct")) * 1000000L / col("n_words"))
            .cast("long"))
          .otherwise(0L))
    // raw (non-distinct) bigrams: frequency is the point here, so this
    // deliberately does NOT reuse Dedup.docShingles (which distincts —
    // the set semantics Jaccard/MinHash need)
    val bigrams = docs
      .select(col(idCol).as("id"), TextOps.words(col(textCol)).as("__ws"))
      .select(col("id"), explode(TextOps.shingles(col("__ws"), 2)).as("gram"))
    val counted = bigrams.groupBy(col("id"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(max(col("c")).as("max_c"), sum(col("c")).as("n_bigrams"))
      .select(col("id"),
        floor(col("max_c") * 1000000L / col("n_bigrams")).cast("long")
          .as("top_bigram_share_micro"))
    spine.join(counted, Seq("id"), "left")
      .select(col("id"), col("n_words"), col("dup_word_ratio_micro"),
        coalesce(col("top_bigram_share_micro"), lit(0L))
          .as("top_bigram_share_micro"))
  }
}
