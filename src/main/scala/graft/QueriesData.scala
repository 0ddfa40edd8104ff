package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Curation, Dedup, MultiModal, Similarity, TextOps}

/** Driver-oracle queries for the training-data pipeline operators
  * (dedup family, similarity search, text analysis, multimodal plumbing,
  * event-stream analytics) over the driver's `documents` / `embeddings` /
  * `events` tables.
  *
  * Design rule shared with [[QueriesCrawl]]: integer/string math and
  * md5-derived hashing only, so the DuckDB oracle reproduces every value
  * exactly; floating point appears only in cosine similarities, computed
  * identically (double precision, sequential) and rounded to 4 dp.
  */
object QueriesData {

  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // DuckDB twin of TextOps.hash60
  private def sqlHash60(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT)"

  // DuckDB twin of TextOps.words
  private val sqlWords =
    "list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)"

  // DuckDB CTE: distinct word-3-shingles per doc — twin of Dedup.docShingles
  private val sqlShinglesCte: String =
    (s"w AS (SELECT doc_id, $sqlWords AS ws FROM documents), " +
      "sh AS (SELECT DISTINCT doc_id AS id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle " +
      "FROM w, LATERAL unnest(generate_series(1, len(ws) - 2)) t(i) WHERE len(ws) >= 3)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact dedup -------------------------------------------------
    "q16_exact_dedup" -> ((s, d) =>
      Dedup.exactDupMarks(tbl(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("content_hash"), col("keeper_id"),
          col("is_dup").cast("long").as("is_dup"))),

    // ---- text analysis ----------------------------------------------
    "q17_token_stats" -> ((s, d) =>
      tbl(s, d, "documents").select(col("doc_id"),
        size(TextOps.words(col("text"))).cast("long").as("n_words"),
        size(TextOps.alphaTokens(col("text"))).cast("long").as("n_alpha"),
        size(TextOps.bpeishTokens(col("text"))).cast("long").as("n_bpeish"))),

    "q18_quality_score" -> ((s, d) => {
      val w = TextOps.words(col("text"))
      tbl(s, d, "documents").select(col("doc_id"),
        TextOps.nChars(col("text")).as("n_chars"),
        TextOps.alphaRatioMicro(col("text")).as("alpha_ratio_micro"),
        TextOps.stopwordRatioMicro(w).as("stopword_ratio_micro"),
        TextOps.meanWordLenMicro(w).as("mean_word_len_micro"))
    }),

    "q19_lang_id" -> ((s, d) =>
      tbl(s, d, "documents").select(col("doc_id"),
        TextOps.langId(TextOps.words(col("text"))).as("pred_lang"))),

    "q20_fingerprint" -> ((s, d) =>
      tbl(s, d, "documents").select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"))),

    // ---- n-gram Jaccard ----------------------------------------------
    "q21_shingle_stats" -> ((s, d) => {
      // n_shingles needs no shingle array at all (= n_words - k + 1); only
      // the distinct count materializes shingle strings — one pass. Words
      // bind to their own projection first (see Dedup.docShingles: inlining
      // the split into the shingle lambda re-splits per element).
      tbl(s, d, "documents")
        .select(col("doc_id"), TextOps.words(col("text")).as("__ws"))
        .select(col("doc_id"),
          greatest(size(col("__ws")) - 2, lit(0)).cast("long").as("n_shingles"),
          size(array_distinct(TextOps.shingles(col("__ws"), 3))).cast("long").as("n_distinct"))
        .filter(col("n_shingles") > 0)
    }),

    // df-capped: stop-shingles (df > 16) propose no candidate pairs, but
    // verification runs over the full sets, so reported values stay exact
    "q22_jaccard_pairs" -> ((s, d) =>
      Dedup.jaccardPairs(
        Dedup.docShingles(tbl(s, d, "documents"), "doc_id", "text", 3),
        minJaccardMicro = 10000L, maxShingleDf = 16L)),

    // ---- MinHash + LSH -----------------------------------------------
    "q23_minhash_sigs" -> ((s, d) =>
      Dedup.minhashSignatures(
        Dedup.docShingles(tbl(s, d, "documents"), "doc_id", "text", 3), k = 8)
        .select(col("id"), col("seed").cast("long").as("seed"), col("minhash"))),

    "q24_lsh_pairs" -> ((s, d) =>
      Dedup.lshCandidates(
        Dedup.minhashSignatures(
          Dedup.docShingles(tbl(s, d, "documents"), "doc_id", "text", 3), k = 8),
        k = 8, bands = 2)),

    // ---- SimHash -----------------------------------------------------
    "q25_simhash" -> ((s, d) =>
      Dedup.simhash(tbl(s, d, "documents"), "doc_id", "text", bits = 32)),

    // ---- composed near-dedup pipeline (LSH propose → Jaccard verify →
    // keeper assignment) — the end-to-end curator operator -------------
    "q39_near_dup_pipeline" -> ((s, d) =>
      Dedup.nearDupKeepers(tbl(s, d, "documents"), "doc_id", "text",
        shingleK = 3, hashes = 8, bands = 2, minJaccardMicro = 10000L)),

    // ---- similarity search / embedding dedup -------------------------
    "q26_cosine_topk" -> ((s, d) => {
      val e = tbl(s, d, "embeddings")
      Similarity.bruteTopK(e.filter(col("vec_id") < 50), e, k = 5)
        .select(col("vec_id"), col("nn_id"), col("rank").cast("long").as("rank"), col("sim"))
    }),

    "q27_lsh_buckets" -> ((s, d) =>
      Similarity.lshBuckets(tbl(s, d, "embeddings"), planes = 8)),

    // 8-table OR-amplified LSH over 5-bit signatures: the AnnSweep-chosen
    // recall point (recall@3 0.55 at ~23% candidate fraction on the
    // near-uniform synthetic embeddings — see SURVEY §8.3; IVF is the
    // primary ANN scale path, LSH the near-dup candidate generator)
    "q28_lsh_ann_topk" -> ((s, d) =>
      Similarity.lshTopK(tbl(s, d, "embeddings"), planes = 5, k = 3, tables = 8)
        .select(col("vec_id"), col("nn_id"), col("rank").cast("long").as("rank"), col("sim"))),

    "q29_embed_near_dups" -> ((s, d) =>
      Similarity.embeddingNearDups(tbl(s, d, "embeddings"), planes = 4, simThreshold = 0.30)),

    // IVF-flat ANN: seeded 16-cell codebook, 4-probe queries
    "q42_ivf_ann_topk" -> ((s, d) => {
      val e = tbl(s, d, "embeddings")
      Similarity.ivfTopK(e.filter(col("vec_id") < 40), e,
          kCells = 16, nprobe = 4, k = 3)
        .select(col("vec_id"), col("nn_id"),
          col("rank").cast("long").as("rank"), col("sim"))
    }),

    // IVF over a TRAINED codebook: 2 Lloyd iterations of spherical k-means
    // (deterministic integer-scaled centroid means), then the same
    // assignment / probe / per-cell-join plan as q42
    "q44_kmeans_ivf" -> ((s, d) => {
      val e = tbl(s, d, "embeddings")
      val cents = Similarity.kmeansCodebook(e, kCells = 16, iters = 2)
      Similarity.ivfTopKWith(e.filter(col("vec_id") < 40), e, cents,
          nprobe = 4, k = 3)
        .select(col("vec_id"), col("nn_id"),
          col("rank").cast("long").as("rank"), col("sim"))
    }),

    // PQ-ADC ANN (Jégou et al. 2011): 16 subspaces × 64 codewords trained
    // with 2 Euclidean Lloyd iterations (integer-scaled deterministic
    // means), corpus stored as 16 codes/vector (16× compression), queries
    // scored via a broadcast lookup table of integer-scaled partials —
    // the memory-bound ANN path where even IVF's raw embeddings are too
    // big to keep hot. (m, kCodes) is the AnnSweep-chosen point: recall@3
    // 0.44 at 16× on the near-uniform synthetic embeddings (the LSH-style
    // worst case — see SURVEY §8.3); higher compression trades recall
    // smoothly (0.14 at 64×), all settings measured in the sweep.
    "q53_pq_ann" -> ((s, d) => {
      val e = tbl(s, d, "embeddings")
      Similarity.pqTopK(e.filter(col("vec_id") < 40), e,
          m = 16, kCodes = 64, iters = 2, k = 3)
        .select(col("vec_id"), col("nn_id"),
          col("rank").cast("long").as("rank"), col("sim"))
    }),

    // IVF-PQ composition (Jégou et al. 2011 §V): IVF probes restrict the
    // scan to 4 of 16 cells, PQ-ADC scores the candidates from codes —
    // the memory-bound ANN tier with the inverted-file scan bound on top
    // (q42's probe plan + q53's LUT plan composed)
    "q54_ivfpq_ann" -> ((s, d) => {
      val e = tbl(s, d, "embeddings")
      Similarity.ivfpqTopK(e.filter(col("vec_id") < 40), e,
          kCells = 16, nprobe = 4, m = 16, kCodes = 64, iters = 2, k = 3)
        .select(col("vec_id"), col("nn_id"),
          col("rank").cast("long").as("rank"), col("sim"))
    }),

    // ---- multimodal plumbing ----------------------------------------
    "q30_media_meta" -> ((s, d) =>
      MultiModal.metaOnly(
        MultiModal.assetsFromText(tbl(s, d, "documents"), "doc_id", "text"))),

    // resize planning: derived dims (SQL-expressible so the geometry math
    // gets an exact oracle; real dims come from the decode pass, q36)
    "q40_media_resize" -> ((s, d) => {
      val feats = tbl(s, d, "documents").select(col("doc_id"),
        lit("image").as("kind"),
        (col("n_chars") % 900 + 100).cast("int").as("width"),
        ((col("n_chars") * 7) % 700 + 100).cast("int").as("height"))
      MultiModal.resizeToFit(feats, 400, 300)
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("out_w").cast("long").as("out_w"),
          col("out_h").cast("long").as("out_h"))
    }),

    // ---- event-stream analytics -------------------------------------
    "q31_event_window" -> ((s, d) =>
      tbl(s, d, "events")
        .select(col("event_type"),
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          floor(col("value") * 1000).cast("long").as("value_milli"))
        .groupBy(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("n"), sum(col("value_milli")).as("sum_milli"))),

    // content-defined rolling-hash fingerprint (Karp-Rabin base-257 mod
    // 2^31-1, winnowing min over 32-char windows) via the NATIVE Catalyst
    // expression (graft.functions.RollingFingerprint — doGenCode, no UDF).
    // The DuckDB twin inlines the 32 precomputed power constants and
    // evaluates each window's polynomial directly (mod of the full sum ==
    // incremental mod).
    "q38_rolling_fingerprint" -> ((s, d) => {
      GraftExtensions.register(s)
      tbl(s, d, "documents").select(col("doc_id"),
        expr("graft_rolling_fingerprint(text, 32)").as("rfp"))
    }),

    // streaming first-seen dedup, batch form (same code path runs on a
    // readStream with checkpointed state — parity tested in StreamingSpec)
    "q43_stream_dedup" -> ((s, d) => {
      import s.implicits._
      val docs = tbl(s, d, "documents")
        .select(col("doc_id"), md5(col("text")).as("content_hash"))
        .as[graft.streaming.DedupStream.DocHash]
      graft.streaming.DedupStream.firstSeen(s, docs).toDF()
    }),

    "q32_sessionize" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      tbl(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // ---- corpus curation (contamination / split / PII / repetition) --
    // benchmark = every 97th doc standing in for an eval suite; flag any
    // corpus doc sharing a word-3-shingle with it (broadcast semi-join on
    // shingle hashes — the decontamination sweep's scale shape)
    "q46_contamination" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      Curation.contaminationMarks(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0), "text", k = 3)
    }),

    "q47_hash_split" -> ((s, d) =>
      Curation.hashSplit(tbl(s, d, "documents"), "doc_id", "v1",
        trainMicro = 900000L, valMicro = 50000L)),

    // the corpus has no native PII, so the query PLANTS a deterministic
    // email+phone prefix per doc and redacts it back out — both engines
    // build and strip the identical string, so the oracle checks the regex
    // semantics end-to-end (the operator itself is corpus-agnostic)
    "q48_pii_redact" -> ((s, d) => {
      val planted = tbl(s, d, "documents").select(col("doc_id"),
        concat(lit("u"), col("doc_id").cast("string"), lit("@example.com tel "),
          lit("+1 555-00"), col("doc_id").cast("string"), lit(" "), col("text"))
          .as("text"))
      val cols = Curation.redactPii(col("text"))
      planted.select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
        .withColumn("redacted_hash", TextOps.hash60(col("redacted")))
        .drop("redacted")
    }),

    "q49_repetition" -> ((s, d) =>
      Curation.repetitionStats(tbl(s, d, "documents"), "doc_id", "text")),

    // sliding 32-token windows every 24 tokens (25% overlap) — the
    // context-window chunking shape; chunk content pinned by hash
    "q50_chunk_tokens" -> ((s, d) =>
      Curation.chunkTokens(tbl(s, d, "documents"), "doc_id", "text",
        window = 32, stride = 24)),

    // concat-and-cut packing into 256-token sequences over 8 hash shards
    "q51_pack_sequences" -> ((s, d) =>
      Curation.packSequences(tbl(s, d, "documents"), "doc_id", "text",
        budget = 256L, nShards = 8, salt = "pack1")),

    // mixture recipe: keep all of src0, 25% of src1, none of src2, 75% of
    // src3, 50% of everything else
    "q52_mixture_sample" -> ((s, d) =>
      Curation.mixtureSample(tbl(s, d, "documents"), "doc_id", "source",
        Seq("src0" -> 1000000L, "src1" -> 250000L, "src2" -> 0L,
          "src3" -> 750000L),
        defaultMicro = 500000L, salt = "mix1")))

  def oracleSql: Map[String, String] = Map(
    "q16_exact_dedup" ->
      ("SELECT doc_id, md5(text) AS content_hash, " +
        "min(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id, " +
        "CAST(CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) THEN 1 ELSE 0 END AS BIGINT) AS is_dup " +
        "FROM documents"),

    "q17_token_stats" ->
      (s"SELECT doc_id, CAST(len($sqlWords) AS BIGINT) AS n_words, " +
        "CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_alpha, " +
        "CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpeish " +
        "FROM documents"),

    "q18_quality_score" ->
      (s"WITH w AS (SELECT doc_id, text, $sqlWords AS ws FROM documents) " +
        "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, " +
        "CAST(floor(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1000000 / greatest(length(text), 1)) AS BIGINT) AS alpha_ratio_micro, " +
        s"CAST(floor(len(list_filter(ws, x -> list_contains([${TextOps.stopwords.map(sw => s"'$sw'").mkString(",")}], x))) * 1000000 / greatest(len(ws), 1)) AS BIGINT) AS stopword_ratio_micro, " +
        "CAST(floor(list_sum(list_transform(ws, x -> len(x))) * 1000000 / greatest(len(ws), 1)) AS BIGINT) AS mean_word_len_micro " +
        "FROM w"),

    "q19_lang_id" ->
      (s"WITH w AS (SELECT doc_id, $sqlWords AS ws FROM documents), scores AS (" +
        TextOps.langProfiles.map { case (lang, profile) =>
          s"SELECT doc_id, '$lang' AS lang, len(list_filter(ws, x -> list_contains([${profile.map(p => s"'$p'").mkString(",")}], x))) AS score FROM w"
        }.mkString(" UNION ALL ") +
        ") SELECT doc_id, lang AS pred_lang FROM scores QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) = 1"),

    "q20_fingerprint" ->
      s"SELECT doc_id, ${sqlHash60("regexp_replace(lower(text), '[^a-z0-9]', '', 'g')")} AS fp FROM documents",

    "q21_shingle_stats" ->
      ("WITH w AS (SELECT doc_id, " + sqlWords + " AS ws FROM documents), " +
        "s AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh FROM w, LATERAL unnest(generate_series(1, len(ws) - 2)) t(i) WHERE len(ws) >= 3) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles, CAST(count(DISTINCT sh) AS BIGINT) AS n_distinct FROM s GROUP BY doc_id"),

    "q22_jaccard_pairs" ->
      (s"WITH $sqlShinglesCte, " +
        s"shh AS (SELECT DISTINCT id, ${sqlHash60("shingle")} AS h FROM sh), " +
        "dfs AS (SELECT h, CAST(count(*) AS BIGINT) AS df FROM shh GROUP BY h), " +
        "capped AS (SELECT shh.id, shh.h FROM shh JOIN dfs USING (h) WHERE dfs.df <= 16), " +
        "cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM capped a JOIN capped b ON a.h = b.h AND a.id < b.id), " +
        "sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM shh GROUP BY id), " +
        "inter AS (SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS inter " +
        "FROM cand c JOIN shh a ON a.id = c.id_a JOIN shh b ON b.id = c.id_b AND b.h = a.h GROUP BY c.id_a, c.id_b) " +
        "SELECT id_a, id_b, inter, sa.n + sb.n - inter AS uni, " +
        "CAST(floor(inter * 1000000 / (sa.n + sb.n - inter)) AS BIGINT) AS jaccard_micro " +
        "FROM inter JOIN sizes sa ON inter.id_a = sa.id JOIN sizes sb ON inter.id_b = sb.id " +
        "WHERE CAST(floor(inter * 1000000 / (sa.n + sb.n - inter)) AS BIGINT) >= 10000"),

    "q23_minhash_sigs" ->
      (s"WITH $sqlShinglesCte " +
        "SELECT id, CAST(seed AS BIGINT) AS seed, " + "min(((2*seed+1) * ((" + sqlHash60("shingle") + ") % 2147483647) + (seed * 1540483477) % 2147483647) % 2147483647) AS minhash " +
        "FROM sh, LATERAL unnest(generate_series(0, 7)) t(seed) GROUP BY id, seed"),

    "q24_lsh_pairs" ->
      (s"WITH $sqlShinglesCte, sigs AS (" +
        "SELECT id, seed, " + "min(((2*seed+1) * ((" + sqlHash60("shingle") + ") % 2147483647) + (seed * 1540483477) % 2147483647) % 2147483647) AS minhash " +
        "FROM sh, LATERAL unnest(generate_series(0, 7)) t(seed) GROUP BY id, seed), " +
        "banded AS (SELECT id, seed // 4 AS band, string_agg(CAST(minhash AS VARCHAR), '_' ORDER BY seed) AS bandkey FROM sigs GROUP BY id, seed // 4) " +
        "SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM banded a JOIN banded b " +
        "ON a.band = b.band AND a.bandkey = b.bandkey AND a.id < b.id"),

    "q25_simhash" ->
      (s"WITH toks AS (SELECT doc_id AS id, ${sqlHash60("w")} AS h FROM (SELECT doc_id, unnest($sqlWords) AS w FROM documents)), " +
        "bitsum AS (SELECT id, bit, CAST(sum(((h >> bit) & 1) * 2 - 1) AS BIGINT) AS v " +
        "FROM toks, LATERAL unnest(generate_series(0, 31)) t(bit) GROUP BY id, bit) " +
        "SELECT id, CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash FROM bitsum GROUP BY id"),

    // keeper = component MINIMUM over the verified-pair graph (recursive
    // reachability — the twin of Dedup.connectedMinLabel's fixed point)
    "q39_near_dup_pipeline" ->
      (s"WITH RECURSIVE $sqlShinglesCte, sigs AS (" +
        "SELECT id, seed, " + "min(((2*seed+1) * ((" + sqlHash60("shingle") + ") % 2147483647) + (seed * 1540483477) % 2147483647) % 2147483647) AS minhash " +
        "FROM sh, LATERAL unnest(generate_series(0, 7)) t(seed) GROUP BY id, seed), " +
        "banded AS (SELECT id, seed // 4 AS band, string_agg(CAST(minhash AS VARCHAR), '_' ORDER BY seed) AS bandkey FROM sigs GROUP BY id, seed // 4), " +
        "cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM banded a JOIN banded b ON a.band = b.band AND a.bandkey = b.bandkey AND a.id < b.id), " +
        s"shh AS (SELECT DISTINCT id, ${sqlHash60("shingle")} AS h FROM sh), " +
        "sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM shh GROUP BY id), " +
        "inter AS (SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS inter FROM cand c " +
        "JOIN shh a ON a.id = c.id_a JOIN shh b ON b.id = c.id_b AND b.h = a.h GROUP BY c.id_a, c.id_b), " +
        "ver AS (SELECT id_a, id_b FROM inter JOIN sizes sa ON inter.id_a = sa.id JOIN sizes sb ON inter.id_b = sb.id " +
        "WHERE CAST(floor(inter * 1000000 / (sa.n + sb.n - inter)) AS BIGINT) >= 10000), " +
        "und AS (SELECT id_a AS src, id_b AS dst FROM ver UNION SELECT id_b, id_a FROM ver), " +
        "reach(id, r) AS (SELECT doc_id, doc_id FROM documents " +
        "UNION SELECT u.dst, reach.r FROM reach JOIN und u ON u.src = reach.id) " +
        "SELECT id, CAST(min(r) AS BIGINT) AS keeper_id, " +
        "CAST(CASE WHEN min(r) <> id THEN 1 ELSE 0 END AS BIGINT) AS is_dup " +
        "FROM reach GROUP BY id"),

    "q26_cosine_topk" ->
      ("WITH pairs AS (SELECT q.vec_id AS vec_id, c.vec_id AS nn_id, " +
        "list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) / " +
        "(sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS sim " +
        "FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id WHERE q.vec_id < 50) " +
        "SELECT vec_id, nn_id, CAST(row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn_id ASC) AS BIGINT) AS rank, round(sim, 4) AS sim " +
        "FROM pairs QUALIFY rank <= 5"),

    "q27_lsh_buckets" ->
      ("WITH pw AS (SELECT p, d, CAST((((" + sqlHash60("CAST(p AS VARCHAR) || '|' || CAST(d AS VARCHAR)") + ") & 1) * 2 - 1) AS DOUBLE) AS wt " +
        "FROM unnest(generate_series(0, 7)) tp(p), unnest(generate_series(0, 63)) td(d)), " +
        "proj AS (SELECT e.vec_id, pw.p, sum(e.embedding[pw.d + 1]::DOUBLE * pw.wt) AS s FROM embeddings e, pw GROUP BY e.vec_id, pw.p) " +
        "SELECT vec_id, CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket FROM proj GROUP BY vec_id"),

    "q28_lsh_ann_topk" ->
      // 8 tables x 5 planes: global plane id gp in 0..39, table = gp // 5,
      // bit = gp % 5; composite bucket = table * 32 + signature; a pair
      // found in several tables dedups via DISTINCT before ranking
      ("WITH pw AS (SELECT gp, gp // 5 AS t, gp % 5 AS p, d, CAST((((" + sqlHash60("CAST(gp AS VARCHAR) || '|' || CAST(d AS VARCHAR)") + ") & 1) * 2 - 1) AS DOUBLE) AS wt " +
        "FROM unnest(generate_series(0, 39)) tp(gp), unnest(generate_series(0, 63)) td(d)), " +
        "proj AS (SELECT e.vec_id, pw.t, pw.p, sum(e.embedding[pw.d + 1]::DOUBLE * pw.wt) AS s FROM embeddings e, pw GROUP BY e.vec_id, pw.t, pw.p), " +
        "buckets AS (SELECT vec_id, CAST(t * 32 + sum(CASE WHEN s > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket FROM proj GROUP BY vec_id, t), " +
        "pairs AS (SELECT DISTINCT qa.vec_id AS vec_id, qb.vec_id AS nn_id, " +
        "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / " +
        "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS sim " +
        "FROM buckets qa JOIN buckets qb ON qa.bucket = qb.bucket AND qa.vec_id <> qb.vec_id " +
        "JOIN embeddings a ON a.vec_id = qa.vec_id JOIN embeddings b ON b.vec_id = qb.vec_id) " +
        "SELECT vec_id, nn_id, CAST(row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn_id ASC) AS BIGINT) AS rank, round(sim, 4) AS sim " +
        "FROM pairs QUALIFY rank <= 3"),

    "q29_embed_near_dups" ->
      ("WITH pw AS (SELECT p, d, CAST((((" + sqlHash60("CAST(p AS VARCHAR) || '|' || CAST(d AS VARCHAR)") + ") & 1) * 2 - 1) AS DOUBLE) AS wt " +
        "FROM unnest(generate_series(0, 3)) tp(p), unnest(generate_series(0, 63)) td(d)), " +
        "proj AS (SELECT e.vec_id, pw.p, sum(e.embedding[pw.d + 1]::DOUBLE * pw.wt) AS s FROM embeddings e, pw GROUP BY e.vec_id, pw.p), " +
        "buckets AS (SELECT vec_id, CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket FROM proj GROUP BY vec_id), " +
        "pairs AS (SELECT qa.vec_id AS id_a, qb.vec_id AS id_b, " +
        "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / " +
        "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS sim " +
        "FROM buckets qa JOIN buckets qb ON qa.bucket = qb.bucket AND qa.vec_id < qb.vec_id " +
        "JOIN embeddings a ON a.vec_id = qa.vec_id JOIN embeddings b ON b.vec_id = qb.vec_id) " +
        "SELECT id_a, id_b, round(sim, 4) AS sim FROM pairs WHERE sim >= 0.30"),

    "q42_ivf_ann_topk" -> {
      def cos(a: String, b: String): String =
        s"list_dot_product($a.embedding::DOUBLE[], $b.embedding::DOUBLE[]) / " +
          s"(sqrt(list_dot_product($a.embedding::DOUBLE[], $a.embedding::DOUBLE[])) * " +
          s"sqrt(list_dot_product($b.embedding::DOUBLE[], $b.embedding::DOUBLE[])))"
      ("WITH cents AS (SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 16), " +
        s"asg AS (SELECT e.vec_id, c.cid AS cell FROM embeddings e, cents c " +
        s"QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cos("e", "c")} DESC, c.cid ASC) = 1), " +
        s"probes AS (SELECT q.vec_id AS qid, c.cid AS cell FROM embeddings q, cents c WHERE q.vec_id < 40 " +
        s"QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cos("q", "c")} DESC, c.cid ASC) <= 4), " +
        s"pairs AS (SELECT p.qid AS vec_id, m.vec_id AS nn_id, ${cos("a", "b")} AS sim " +
        "FROM probes p JOIN asg m ON m.cell = p.cell " +
        "JOIN embeddings a ON a.vec_id = p.qid JOIN embeddings b ON b.vec_id = m.vec_id " +
        "WHERE p.qid <> m.vec_id) " +
        "SELECT vec_id, nn_id, CAST(row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn_id ASC) AS BIGINT) AS rank, round(sim, 4) AS sim " +
        "FROM pairs QUALIFY rank <= 3")
    },

    "q44_kmeans_ivf" -> {
      // generic cosine between two DOUBLE[] expressions
      def cosE(a: String, b: String): String =
        s"list_dot_product($a, $b) / " +
          s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
      // one Lloyd iteration: assign to nearest `prev` centroid, then the
      // integer-scaled elementwise mean (exactly Similarity.kmeansCodebook's
      // round(x * 2^20) BIGINT sums — order-independent, so both engines
      // agree bit-for-bit); dim is 64, lists are 1-based. A cell that lost
      // all members keeps its previous centroid (left join + coalesce —
      // kmeansCodebook's keep-old-centroid rule, so the twins can't diverge
      // on a corpus where a cell empties mid-training).
      def iter(prev: String, asg: String, sums: String, next: String): String =
        s"$asg AS (SELECT e.vec_id, c.cid AS cell FROM embeddings e, $prev c " +
          s"QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cosE("e.embedding::DOUBLE[]", "c.emb")} DESC, c.cid ASC) = 1), " +
          s"$sums AS (SELECT a.cell, t.i AS ord, " +
          "SUM(CAST(round(e.embedding[t.i]::DOUBLE * 1048576.0) AS BIGINT)) AS s, COUNT(*) AS n " +
          s"FROM $asg a JOIN embeddings e USING (vec_id), range(1, 65) t(i) GROUP BY a.cell, t.i), " +
          s"${next}_new AS (SELECT cell AS cid, list(s::DOUBLE / n / 1048576.0 ORDER BY ord) AS emb FROM $sums GROUP BY cell), " +
          s"$next AS (SELECT p.cid, coalesce(t.emb, p.emb) AS emb FROM $prev p LEFT JOIN ${next}_new t USING (cid))"
      ("WITH c0 AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id < 16), " +
        iter("c0", "a1", "s1", "c1") + ", " +
        iter("c1", "a2", "s2", "c2") + ", " +
        s"asg AS (SELECT e.vec_id, c.cid AS cell FROM embeddings e, c2 c " +
        s"QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cosE("e.embedding::DOUBLE[]", "c.emb")} DESC, c.cid ASC) = 1), " +
        s"probes AS (SELECT q.vec_id AS qid, c.cid AS cell FROM embeddings q, c2 c WHERE q.vec_id < 40 " +
        s"QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cosE("q.embedding::DOUBLE[]", "c.emb")} DESC, c.cid ASC) <= 4), " +
        s"pairs AS (SELECT p.qid AS vec_id, m.vec_id AS nn_id, ${cosE("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")} AS sim " +
        "FROM probes p JOIN asg m ON m.cell = p.cell " +
        "JOIN embeddings a ON a.vec_id = p.qid JOIN embeddings b ON b.vec_id = m.vec_id " +
        "WHERE p.qid <> m.vec_id) " +
        "SELECT vec_id, nn_id, CAST(row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn_id ASC) AS BIGINT) AS rank, round(sim, 4) AS sim " +
        "FROM pairs QUALIFY rank <= 3")
    },

    "q53_pq_ann" -> {
      // PQ twin: same exploded (vec_id, sub, se) frame, Euclidean
      // assignment argmax dot(x,c) − ‖c‖²/2, integer-scaled codeword
      // means (2^20 BIGINT sums — order-independent, both engines agree
      // bit-for-bit), ADC scoring over BIGINT partial sums. Keep-old-
      // codeword rule mirrored via left join + coalesce.
      def score(v: String, c: String): String =
        s"list_dot_product($v.se, $c.emb) - list_dot_product($c.emb, $c.emb)/2"
      def iter(prev: String, asg: String, sums: String, next: String): String =
        s"$asg AS (SELECT v.vec_id, v.sub, c.cid AS code FROM subv v JOIN $prev c USING (sub) " +
          s"QUALIFY row_number() OVER (PARTITION BY v.vec_id, v.sub ORDER BY ${score("v", "c")} DESC, c.cid ASC) = 1), " +
          s"$sums AS (SELECT a.sub, a.code, t.i AS ord, " +
          "SUM(CAST(round(v.se[t.i] * 1048576.0) AS BIGINT)) AS s, COUNT(*) AS n " +
          s"FROM $asg a JOIN subv v ON v.vec_id = a.vec_id AND v.sub = a.sub, range(1, 5) t(i) GROUP BY a.sub, a.code, t.i), " +
          s"${next}_new AS (SELECT sub, code AS cid, list(s::DOUBLE / n / 1048576.0 ORDER BY ord) AS emb FROM $sums GROUP BY sub, code), " +
          s"$next AS (SELECT p.sub, p.cid, coalesce(t.emb, p.emb) AS emb FROM $prev p LEFT JOIN ${next}_new t ON t.sub = p.sub AND t.cid = p.cid)"
      ("WITH subs AS (SELECT unnest(generate_series(0, 15)) AS sub), " +
        "subv AS (SELECT e.vec_id, s.sub, list_transform(generate_series(1, 4), i -> e.embedding[s.sub * 4 + i]::DOUBLE) AS se FROM embeddings e, subs s), " +
        "b0 AS (SELECT sub, vec_id AS cid, se AS emb FROM subv WHERE vec_id < 64), " +
        iter("b0", "a1", "s1", "b1") + ", " +
        iter("b1", "a2", "s2", "b2") + ", " +
        "codes AS (SELECT v.vec_id, v.sub, c.cid AS code FROM subv v JOIN b2 c USING (sub) " +
        s"QUALIFY row_number() OVER (PARTITION BY v.vec_id, v.sub ORDER BY ${score("v", "c")} DESC, c.cid ASC) = 1), " +
        "lut AS (SELECT v.vec_id AS qid, v.sub, c.cid AS code, " +
        "CAST(round(list_dot_product(v.se, c.emb) * 1048576.0) AS BIGINT) AS dotm, " +
        "CAST(round(list_dot_product(c.emb, c.emb) * 1048576.0) AS BIGINT) AS n2m " +
        "FROM subv v JOIN b2 c USING (sub) WHERE v.vec_id < 40), " +
        "scored AS (SELECT l.qid, cd.vec_id, SUM(l.dotm) AS dots, SUM(l.n2m) AS n2s " +
        "FROM codes cd JOIN lut l ON l.sub = cd.sub AND l.code = cd.code GROUP BY l.qid, cd.vec_id), " +
        "qn AS (SELECT vec_id AS qid, sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn FROM embeddings WHERE vec_id < 40), " +
        "sims AS (SELECT s.qid, s.vec_id AS nid, (s.dots::DOUBLE / 1048576.0) / (q.qn * sqrt(s.n2s::DOUBLE / 1048576.0)) AS sim " +
        "FROM scored s JOIN qn q USING (qid) WHERE s.qid <> s.vec_id) " +
        "SELECT qid AS vec_id, nid AS nn_id, CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS BIGINT) AS rank, round(sim, 4) AS sim " +
        "FROM sims QUALIFY rank <= 3")
    },

    "q54_ivfpq_ann" -> {
      // q53's PQ twin (subv/books/codes/lut, integer-scaled BIGINT ADC)
      // composed with q42's IVF twin (cents/asg/probes): candidates are
      // the probed cells' members, scored from codes only
      def cosE(a: String, b: String): String =
        s"list_dot_product($a, $b) / " +
          s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
      def score(v: String, c: String): String =
        s"list_dot_product($v.se, $c.emb) - list_dot_product($c.emb, $c.emb)/2"
      def iter(prev: String, asg: String, sums: String, next: String): String =
        s"$asg AS (SELECT v.vec_id, v.sub, c.cid AS code FROM subv v JOIN $prev c USING (sub) " +
          s"QUALIFY row_number() OVER (PARTITION BY v.vec_id, v.sub ORDER BY ${score("v", "c")} DESC, c.cid ASC) = 1), " +
          s"$sums AS (SELECT a.sub, a.code, t.i AS ord, " +
          "SUM(CAST(round(v.se[t.i] * 1048576.0) AS BIGINT)) AS s, COUNT(*) AS n " +
          s"FROM $asg a JOIN subv v ON v.vec_id = a.vec_id AND v.sub = a.sub, range(1, 5) t(i) GROUP BY a.sub, a.code, t.i), " +
          s"${next}_new AS (SELECT sub, code AS cid, list(s::DOUBLE / n / 1048576.0 ORDER BY ord) AS emb FROM $sums GROUP BY sub, code), " +
          s"$next AS (SELECT p.sub, p.cid, coalesce(t.emb, p.emb) AS emb FROM $prev p LEFT JOIN ${next}_new t ON t.sub = p.sub AND t.cid = p.cid)"
      ("WITH subs AS (SELECT unnest(generate_series(0, 15)) AS sub), " +
        "subv AS (SELECT e.vec_id, s.sub, list_transform(generate_series(1, 4), i -> e.embedding[s.sub * 4 + i]::DOUBLE) AS se FROM embeddings e, subs s), " +
        "b0 AS (SELECT sub, vec_id AS cid, se AS emb FROM subv WHERE vec_id < 64), " +
        iter("b0", "a1", "s1", "b1") + ", " +
        iter("b1", "a2", "s2", "b2") + ", " +
        "codes AS (SELECT v.vec_id, v.sub, c.cid AS code FROM subv v JOIN b2 c USING (sub) " +
        s"QUALIFY row_number() OVER (PARTITION BY v.vec_id, v.sub ORDER BY ${score("v", "c")} DESC, c.cid ASC) = 1), " +
        "lut AS (SELECT v.vec_id AS qid, v.sub, c.cid AS code, " +
        "CAST(round(list_dot_product(v.se, c.emb) * 1048576.0) AS BIGINT) AS dotm, " +
        "CAST(round(list_dot_product(c.emb, c.emb) * 1048576.0) AS BIGINT) AS n2m " +
        "FROM subv v JOIN b2 c USING (sub) WHERE v.vec_id < 40), " +
        "cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id < 16), " +
        s"asg AS (SELECT e.vec_id, c.cid AS cell FROM embeddings e, cents c " +
        s"QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cosE("e.embedding::DOUBLE[]", "c.emb")} DESC, c.cid ASC) = 1), " +
        s"probes AS (SELECT q.vec_id AS qid, c.cid AS cell FROM embeddings q, cents c WHERE q.vec_id < 40 " +
        s"QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cosE("q.embedding::DOUBLE[]", "c.emb")} DESC, c.cid ASC) <= 4), " +
        "cand AS (SELECT p.qid, m.vec_id FROM probes p JOIN asg m ON m.cell = p.cell WHERE p.qid <> m.vec_id), " +
        "scored AS (SELECT c.qid, c.vec_id, SUM(l.dotm) AS dots, SUM(l.n2m) AS n2s " +
        "FROM cand c JOIN codes cd ON cd.vec_id = c.vec_id JOIN lut l ON l.qid = c.qid AND l.sub = cd.sub AND l.code = cd.code " +
        "GROUP BY c.qid, c.vec_id), " +
        "qn AS (SELECT vec_id AS qid, sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn FROM embeddings WHERE vec_id < 40), " +
        "sims AS (SELECT s.qid, s.vec_id AS nid, (s.dots::DOUBLE / 1048576.0) / (q.qn * sqrt(s.n2s::DOUBLE / 1048576.0)) AS sim " +
        "FROM scored s JOIN qn q USING (qid)) " +
        "SELECT qid AS vec_id, nid AS nn_id, CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS BIGINT) AS rank, round(sim, 4) AS sim " +
        "FROM sims QUALIFY rank <= 3")
    },

    "q30_media_meta" ->
      ("SELECT doc_id, CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind, " +
        "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        "CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'flac' ELSE 'h264' END AS codec FROM documents"),

    "q40_media_resize" ->
      ("WITH dims AS (SELECT doc_id, CAST(n_chars % 900 + 100 AS BIGINT) AS w, CAST((n_chars * 7) % 700 + 100 AS BIGINT) AS h FROM documents) " +
        "SELECT doc_id, w AS width, h AS height, " +
        "CAST(CASE WHEN w <= 400 AND h <= 300 THEN w WHEN w * 300 >= h * 400 THEN 400 ELSE w * 300 // h END AS BIGINT) AS out_w, " +
        "CAST(CASE WHEN w <= 400 AND h <= 300 THEN h WHEN w * 300 >= h * 400 THEN h * 400 // w ELSE 300 END AS BIGINT) AS out_h " +
        "FROM dims"),

    "q31_event_window" ->
      ("SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, " +
        "CAST(count(*) AS BIGINT) AS n, CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_milli " +
        "FROM events GROUP BY 1, 2"),

    "q38_rolling_fingerprint" -> {
      val M = (1L << 31) - 1
      val powers = Iterator.iterate(1L)(p => p * 257L % M).take(32).toSeq
      ("WITH c AS (SELECT doc_id, text, length(text) AS n, LEAST(length(text), 32) AS kk FROM documents), " +
        "win AS (SELECT doc_id, i, coalesce(list_sum(list_transform(generate_series(0, kk - 1), " +
        s"j -> CAST(ord(substr(text, i + j, 1)) AS BIGINT) * ([${powers.mkString(",")}][kk - j]))), 0) % 2147483647 AS h " +
        "FROM c, LATERAL unnest(generate_series(1, n - kk + 1)) t(i)) " +
        "SELECT doc_id, CAST(min(h) AS BIGINT) AS rfp FROM win GROUP BY doc_id")
    },

    "q43_stream_dedup" ->
      ("SELECT doc_id, md5(text) AS content_hash FROM documents " +
        "QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1"),

    "q32_sessionize" ->
      ("WITH e AS (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM events), " +
        "flags AS (SELECT user_id, CASE WHEN prev_ts IS NULL OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800 THEN 1 ELSE 0 END AS new_session FROM e) " +
        "SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, CAST(count(*) AS BIGINT) AS n_events FROM flags GROUP BY user_id"),

    // ---- corpus curation ---------------------------------------------
    "q46_contamination" ->
      (s"WITH $sqlShinglesCte, " +
        s"shh AS (SELECT DISTINCT id, ${sqlHash60("shingle")} AS h FROM sh), " +
        "bench AS (SELECT DISTINCT h FROM shh WHERE id % 97 = 0), " +
        "hits AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM shh JOIN bench USING (h) GROUP BY id) " +
        "SELECT d.doc_id AS id, coalesce(n, 0) AS n_contaminated, " +
        "CAST(CASE WHEN coalesce(n, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated " +
        "FROM documents d LEFT JOIN hits ON hits.id = d.doc_id"),

    "q47_hash_split" ->
      (s"WITH b AS (SELECT doc_id AS id, ${sqlHash60("CAST(doc_id AS VARCHAR) || ':v1'")} % 1000000 AS bucket_micro FROM documents) " +
        "SELECT id, bucket_micro, CASE WHEN bucket_micro < 900000 THEN 'train' " +
        "WHEN bucket_micro < 950000 THEN 'val' ELSE 'test' END AS split FROM b"),

    "q48_pii_redact" -> {
      import graft.ops.Curation.{emailRe, phoneRe}
      ("WITH planted AS (SELECT doc_id, 'u' || CAST(doc_id AS VARCHAR) || '@example.com tel +1 555-00' || CAST(doc_id AS VARCHAR) || ' ' || text AS t FROM documents), " +
        s"ae AS (SELECT doc_id, CAST(len(regexp_extract_all(t, '$emailRe')) AS BIGINT) AS n_emails, " +
        s"regexp_replace(t, '$emailRe', '<EMAIL>', 'g') AS t2 FROM planted) " +
        s"SELECT doc_id, n_emails, CAST(len(regexp_extract_all(t2, '$phoneRe')) AS BIGINT) AS n_phones, " +
        sqlHash60(s"regexp_replace(t2, '$phoneRe', '<PHONE>', 'g')") + " AS redacted_hash FROM ae")
    },

    "q49_repetition" ->
      (s"WITH w AS (SELECT doc_id, $sqlWords AS ws FROM documents), " +
        "spine AS (SELECT doc_id AS id, CAST(len(ws) AS BIGINT) AS n_words, CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct FROM w), " +
        "bg AS (SELECT doc_id AS id, ws[i] || ' ' || ws[i+1] AS gram FROM w, LATERAL unnest(generate_series(1, len(ws) - 1)) t(i) WHERE len(ws) >= 2), " +
        "cnt AS (SELECT id, gram, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY id, gram), " +
        "agg AS (SELECT id, CAST(floor(max(c) * 1000000 / sum(c)) AS BIGINT) AS tb FROM cnt GROUP BY id) " +
        "SELECT s.id, s.n_words, " +
        "CAST(CASE WHEN n_words > 0 THEN floor((n_words - n_distinct) * 1000000 / n_words) ELSE 0 END AS BIGINT) AS dup_word_ratio_micro, " +
        "coalesce(tb, 0) AS top_bigram_share_micro FROM spine s LEFT JOIN agg USING (id)"),

    "q50_chunk_tokens" ->
      (s"WITH w AS (SELECT doc_id, $sqlWords AS ws FROM documents), " +
        "c AS (SELECT doc_id AS id, ws, s FROM w, " +
        "LATERAL unnest(generate_series(1, greatest(len(ws) - 32 + 24, 1), 24)) t(s) WHERE len(ws) >= 1) " +
        "SELECT id, CAST((s - 1) // 24 AS BIGINT) AS chunk_idx, CAST(s AS BIGINT) AS start_word, " +
        "CAST(least(32, len(ws) - s + 1) AS BIGINT) AS n_tokens, " +
        sqlHash60("array_to_string(list_slice(ws, s, least(s + 31, len(ws))), ' ')") +
        " AS chunk_hash FROM c"),

    "q51_pack_sequences" ->
      (s"WITH t AS (SELECT doc_id AS id, CAST(len($sqlWords) AS BIGINT) AS n_tokens, " +
        sqlHash60("CAST(doc_id AS VARCHAR) || ':pack1'") + " % 8 AS shard FROM documents), " +
        "p AS (SELECT id, shard, n_tokens, CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY id) AS BIGINT) AS cum " +
        "FROM t WHERE n_tokens > 0) " +
        "SELECT id, shard, n_tokens, cum - n_tokens AS begin_tok, " +
        "(cum - n_tokens) // 256 AS seq_first, (cum - 1) // 256 AS seq_last, " +
        "(cum - 1) // 256 - (cum - n_tokens) // 256 + 1 AS n_seqs FROM p"),

    "q52_mixture_sample" -> {
      val wCase = "CASE \"key\" WHEN 'src0' THEN 1000000 WHEN 'src1' THEN 250000 " +
        "WHEN 'src2' THEN 0 WHEN 'src3' THEN 750000 ELSE 500000 END"
      (s"WITH b AS (SELECT doc_id AS id, source AS \"key\", " +
        sqlHash60("CAST(doc_id AS VARCHAR) || ':mix1'") + " % 1000000 AS bucket_micro FROM documents) " +
        s"SELECT id, \"key\", bucket_micro, CAST($wCase AS BIGINT) AS weight_micro, " +
        s"CAST(CASE WHEN bucket_micro < ($wCase) THEN 1 ELSE 0 END AS BIGINT) AS kept FROM b")
    })
}
