package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data curation, each designed around
  * its scale behavior:
  *
  *  - exact: one hash-groupBy shuffle on the content hash — at 100 TB the
  *    hash (16 bytes) shuffles, never the document bodies;
  *  - n-gram Jaccard: exact pairwise verification via a shingle equi-join —
  *    quadratic in cluster size, so it runs AFTER candidate generation;
  *  - MinHash + LSH: the scale path — fixed-size signatures (k hashes) per
  *    doc, banded into buckets; only docs sharing a band bucket ever meet in
  *    a join (Broder 1997; Leskovec-Rajaraman-Ullman ch.3);
  *  - SimHash: 1 64-bit sketch per doc, near-dup ⇔ small Hamming distance
  *    (Charikar 2002, used by Google for web dedup);
  *  - embedding cosine near-dup lives in [[Similarity]].
  *
  * Everything is integer/md5-hash math ⇒ reproducible bit-exactly by the
  * DuckDB oracle.
  */
object Dedup {

  // ---------------------------------------------------------------------
  // Exact dedup
  // ---------------------------------------------------------------------

  /** Per-row exact-duplicate marking: rows grouped by content hash, keeper =
    * lowest id. Returns (id, content_hash, keeper_id, is_dup).
    * Window over the hash: the shuffle moves (id, 16-byte hash) only. */
  def exactDupMarks(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(col(textCol))
    val w = Window.partitionBy(col("content_hash")).orderBy(col(idCol))
    df.select(col(idCol), h.as("content_hash"))
      .withColumn("keeper_id", first(col(idCol)).over(w))
      .withColumn("is_dup", (col(idCol) =!= col("keeper_id")).cast("int"))
  }

  // ---------------------------------------------------------------------
  // N-gram Jaccard (exact pairwise, post-candidate verification)
  // ---------------------------------------------------------------------

  /** Distinct word-k-shingles per doc: (id, shingle). */
  def docShingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(array_distinct(TextOps.shingles(TextOps.words(col(textCol)), k))).as("shingle"))

  /** Exact Jaccard over all pairs sharing ≥1 shingle.
    * Output: (id_a, id_b, inter, uni, jaccard_micro) with id_a < id_b.
    *
    * Plan: shingle self-equi-join (shuffle on shingle — skew-prone on stop
    * shingles, which is why minhashLsh is the at-scale candidate generator
    * and this is the verifier over its survivors), then one groupBy(pair). */
  def jaccardPairs(shingled: DataFrame, minJaccardMicro: Long): DataFrame = {
    val sizes = shingled.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val a = shingled.as("a")
    val b = shingled.as("b")
    val inter = a.join(b, col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .withColumn("jaccard_micro", floor(col("inter") * 1000000L / col("uni")).cast("long"))
      .filter(col("jaccard_micro") >= minJaccardMicro)
      .select("id_a", "id_b", "inter", "uni", "jaccard_micro")
  }

  // ---------------------------------------------------------------------
  // MinHash + LSH
  // ---------------------------------------------------------------------

  /** MinHash permutation family (Broder 1997): ONE base hash per shingle,
    * then k affine permutations h_s(x) = ((2s+1)·x + b_s) mod p over the
    * Mersenne prime p = 2^31−1 (products stay < 2^35 — portable BIGINT math
    * in any engine, no overflow). */
  val MinhashP = 2147483647L
  private val MinhashBSalt = 1540483477L

  def minhashPerm(seed: Column, base: Column): Column =
    ((seed * 2L + 1L) * base + (seed * MinhashBSalt) % MinhashP) % MinhashP

  /** Pure-Scala twin for tests/oracles. */
  def minhashPermLocal(seed: Long, shingleHash60: Long): Long = {
    val base = shingleHash60 % MinhashP
    ((seed * 2 + 1) * base + (seed * MinhashBSalt) % MinhashP) % MinhashP
  }

  /** MinHash signatures: for seed s in [0,k), min over shingles of the
    * permuted base hash. Output (id, seed, minhash) — k rows per doc.
    * The expensive md5 base hash computes ONCE per shingle; the k-way
    * expansion is three integer ops per row. One narrow explode + one
    * groupBy(id, seed) with map-side partial min: the shuffle carries k
    * longs per doc regardless of doc size. */
  def minhashSignatures(shingled: DataFrame, k: Int): DataFrame =
    shingled
      .withColumn("base", TextOps.hash60(col("shingle")) % MinhashP)
      .select(col("id"), col("base"),
        explode(sequence(lit(0L), lit(k - 1L), lit(1L))).as("seed"))
      .withColumn("h", minhashPerm(col("seed"), col("base")))
      .groupBy(col("id"), col("seed"))
      .agg(min(col("h")).as("minhash"))

  /** LSH banding: signature split into `bands` bands of k/bands rows; band
    * key = concat of the band's minhashes. Docs sharing any (band, key)
    * bucket become candidate pairs. Output (id_a, id_b) distinct.
    * The bucket join shuffles only (id, band, 1 hash) rows. */
  def lshCandidates(signatures: DataFrame, k: Int, bands: Int): DataFrame = {
    val rowsPerBand = k / bands
    require(bands * rowsPerBand == k, s"bands=$bands must divide k=$k")
    val banded = signatures
      .withColumn("band", (col("seed") / rowsPerBand).cast("int"))
      .groupBy(col("id"), col("band"))
      // deterministic band key independent of aggregation order: seeds within
      // a band are sorted before concatenation
      .agg(sort_array(collect_list(struct(col("seed"), col("minhash")))).as("sm"))
      .withColumn("bandkey",
        array_join(transform(col("sm"), x => x.getField("minhash").cast("string")), "_"))
      .select("id", "band", "bandkey")
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bandkey") === col("b.bandkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard verification restricted to a candidate-pair set: the
    * at-scale shape (LSH proposes, exact verifies) — the shingle join runs
    * per candidate pair, never all-pairs. */
  def verifiedNearDups(shingled: DataFrame, candidates: DataFrame,
                       minJaccardMicro: Long): DataFrame = {
    val sizes = shingled.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val a = shingled.select(col("id").as("id_a"), col("shingle"))
    val b = shingled.select(col("id").as("id_b"), col("shingle"))
    val inter = candidates.join(a, "id_a").join(b, Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .withColumn("jaccard_micro", floor(col("inter") * 1000000L / col("uni")).cast("long"))
      .filter(col("jaccard_micro") >= minJaccardMicro)
      .select("id_a", "id_b", "jaccard_micro")
  }

  /** The composed near-dedup pipeline a training-data curator runs:
    * shingle → MinHash signatures → LSH candidate pairs → exact-Jaccard
    * verification → per-doc keeper assignment (keeper = min verified
    * neighbor id; since candidate pairs are oriented id_a < id_b, one hop
    * reaches each cluster's minimum for the dominant pairwise-dup case).
    * Output: (id, keeper_id, is_dup). */
  def nearDupKeepers(df: DataFrame, idCol: String, textCol: String,
                     shingleK: Int, hashes: Int, bands: Int,
                     minJaccardMicro: Long): DataFrame = {
    val sh = docShingles(df, idCol, textCol, shingleK)
    val cand = lshCandidates(minhashSignatures(sh, hashes), hashes, bands)
    val dups = verifiedNearDups(sh, cand, minJaccardMicro)
    df.select(col(idCol).as("id"))
      .join(dups.groupBy(col("id_b").as("id")).agg(min(col("id_a")).as("min_nbr")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("min_nbr"), col("id")).as("keeper_id"))
      .withColumn("is_dup", (col("id") =!= col("keeper_id")).cast("long"))
  }

  // ---------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------

  /** SimHash sketch over the word stream with `bits` bit positions
    * (Charikar 2002): token hash h = hash60(word); bit b of the sketch is 1
    * iff sum over token occurrences of (2*((h>>b)&1) - 1) > 0.
    *
    * Shape: tokens explode once, bits expand `bits`×, then ONE
    * groupBy(id, bit) + one groupBy(id) — both partial-aggregated map-side.
    * Output (id, simhash). */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        explode(TextOps.words(col(textCol))).as("w"))
      .withColumn("h", TextOps.hash60(col("w")))
    toks
      .select(col("id"), col("h"),
        explode(sequence(lit(0), lit(bits - 1), lit(1))).as("bit"))
      // shiftright/shiftleft with a column shift count: SQL expression form
      // (the Scala functions API only takes a literal Int shift)
      .withColumn("sgn", expr("(shiftright(h, bit) & CAST(1 AS BIGINT)) * 2 - 1"))
      .groupBy(col("id"), col("bit"))
      .agg(sum(col("sgn")).as("v"))
      .withColumn("bitval",
        when(col("v") > 0, expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(lit(0L)))
      .groupBy(col("id"))
      .agg(sum(col("bitval")).as("simhash"))
  }

  /** Hamming distance between two simhash sketches (bit_count of xor). */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
