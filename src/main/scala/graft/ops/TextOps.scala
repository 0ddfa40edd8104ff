package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, quality scoring, language ID, fingerprinting, shingling.
  *
  * All column builders are pure Catalyst expressions (codegen'd, no UDFs on
  * the hot path) so they whole-stage-compile and push down at 100 TB scale.
  * Numeric outputs use integer math (micro-units / portable md5-derived
  * hashes) so results are bit-identical across engines — the driver's DuckDB
  * oracle reproduces every one of them exactly.
  */
object TextOps {

  /** Portable 60-bit hash: first 15 hex digits of md5, as a non-negative
    * Long. Identical in any engine with md5 (DuckDB:
    * ('0x'||substr(md5(s),1,15))::BIGINT). Used wherever the reference
    * reaches for metro hash64 (src/main.rs:24) but cross-engine
    * reproducibility matters more than speed; xxhash64 stays the in-engine
    * hash for partitioning (graft.Frontier.bucketCol).
    */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Pure-Scala twin of [[hash60]] (for tests / the sequential oracle). */
  def hash60Local(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Whitespace tokens, empties dropped (both engines drop them explicitly:
    * Spark's split() trims trailing empties, DuckDB's string_split keeps
    * them — the filter makes the two identical). */
  def words(text: Column): Column =
    filter(split(text, "\\s+"), w => length(w) > 0)

  /** Alphabetic tokens [a-zA-Z]+, lowercased — the reference's term stream
    * (src/main.rs:67,261). */
  def alphaTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  /** BPE-ish pre-tokenizer: runs of letters | runs of digits | single
    * non-alnum-non-space — the shape a GPT-style regex pre-tokenizer
    * produces, as a count (token budget estimation at corpus scale). */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Word k-shingles (k consecutive words joined by a single space), the
    * MinHash/Jaccard unit. Empty array when the doc has fewer than k words. */
  def shingles(wordsCol: Column, k: Int): Column = {
    val n = size(wordsCol)
    when(n >= k,
      transform(sequence(lit(1), n - (k - 1), lit(1)), i =>
        concat_ws(" ", (0 until k).map(j => element_at(wordsCol, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Quality-score columns in exact integer micro-units
    * (floor(ratio * 1e6)): alphabetic-char ratio, stopword ratio,
    * mean word length. Integer end-to-end ⇒ engine-portable. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "from", "that", "this")

  def nChars(text: Column): Column = length(text).cast("long")

  def alphaRatioMicro(text: Column): Column =
    floor(length(regexp_replace(text, "[^a-zA-Z]", "")).cast("long") * 1000000L /
      greatest(length(text).cast("long"), lit(1L))).cast("long")

  def stopwordRatioMicro(wordsCol: Column): Column = {
    val sw = array(stopwords.map(lit): _*)
    floor(size(filter(wordsCol, w => array_contains(sw, w))).cast("long") * 1000000L /
      greatest(size(wordsCol).cast("long"), lit(1L))).cast("long")
  }

  def meanWordLenMicro(wordsCol: Column): Column =
    floor(aggregate(wordsCol, lit(0L), (acc, w) => acc + length(w)) * 1000000L /
      greatest(size(wordsCol).cast("long"), lit(1L))).cast("long")

  /** Language-ID by profile-token voting: each language has a small set of
    * characteristic tokens; score = hit count over the word stream; prediction
    * = argmax score with lexicographic tie-break (deterministic). An n-gram
    * Naive-Bayes profile reduces to exactly this shape (per-class token-hit
    * aggregation), so the plan — one narrow pass, no shuffle — is the one
    * that matters at scale. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "customer", "hash"),
    "en" -> Seq("the", "and", "of", "is", "order", "table", "window", "group"),
    "es" -> Seq("el", "la", "los", "que", "slow", "agg", "merge", "vector"),
    "fr" -> Seq("le", "la", "les", "est", "scan", "data", "query", "small"),
    "zh" -> Seq("de", "shi", "bu", "le", "join", "column", "row", "value"))

  /** (lang, score) struct array; caller takes argmax. */
  def langScores(wordsCol: Column): Column =
    array(langProfiles.map { case (lang, profile) =>
      val pf = array(profile.map(lit): _*)
      struct(
        size(filter(wordsCol, w => array_contains(pf, w))).cast("long").as("score"),
        lit(lang).as("lang"))
    }: _*)

  /** Predicted language: max (score, then lang desc — array_max on the
    * struct compares fieldwise, deterministic). */
  def langId(wordsCol: Column): Column =
    array_max(langScores(wordsCol)).getField("lang")

  /** Document fingerprint: md5-60-bit of the normalized text (lowercase,
    * non-alphanumerics stripped) — the cross-engine-checkable fingerprint. */
  def fingerprint(text: Column): Column =
    hash60(regexp_replace(lower(text), "[^a-z0-9]", ""))

  /** Karp–Rabin rolling hash over a string (base-257 poly mod the Mersenne
    * prime 2^31-1, so every product stays within 62 bits) plus
    * winnowing-style minimum over all k-length windows — the classic
    * content-defined fingerprint. This is the pure-Scala TWIN for tests;
    * the engine's form is the native Catalyst expression
    * graft.functions.RollingFingerprint (doGenCode — whole-stage-codegen'd,
    * registered as graft_rolling_fingerprint via GraftExtensions). */
  def rollingFingerprint(text: String, k: Int): Long = {
    val M = (1L << 31) - 1
    val B = 257L
    def mulmod(a: Long, b: Long): Long = a * b % M
    if (text.length < k) {
      var h = 0L
      text.foreach(c => h = (mulmod(h, B) + c) % M)
      h
    } else {
      var pow = 1L
      (1 until k).foreach(_ => pow = mulmod(pow, B))
      var h = 0L
      (0 until k).foreach(i => h = (mulmod(h, B) + text.charAt(i)) % M)
      var min = h
      var i = k
      while (i < text.length) {
        h = (h - mulmod(text.charAt(i - k), pow) % M + M) % M
        h = (mulmod(h, B) + text.charAt(i)) % M
        if (h < min) min = h
        i += 1
      }
      min
    }
  }

}
