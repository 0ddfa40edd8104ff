package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>).
  *
  * Two tiers:
  *  - [[bruteTopK]]: exact cosine top-k via a (queries × corpus) join —
  *    the correctness baseline. The join is a broadcast of the (small) query
  *    side against the corpus scan, so the corpus never shuffles; cost is
  *    O(|Q|·|C|·d) compute, embarrassingly parallel.
  *  - [[lshBuckets]] + [[lshTopK]]: the scale path — random-hyperplane LSH
  *    (Charikar 2002). Sign-pattern bucket per vector; candidates only meet
  *    within a bucket, turning the quadratic join into a per-bucket join.
  *    Hyperplanes are ±1 Rademacher vectors derived from the portable
  *    md5 hash, so bucket assignment is engine-reproducible (no RNG state).
  *
  * Dot products are computed with built-in higher-order functions
  * (zip_with + aggregate) in double precision, left-to-right — codegen'd,
  * no UDF, and bit-reproducible.
  */
object Similarity {

  /** Sum of elementwise products, double precision, sequential. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each vector of `queries` within `corpus`.
    * Output: (vec_id, nn_id, rank, sim) — sim rounded to 4 dp for
    * cross-engine comparison; rank ties broken by nn_id asc.
    * `queries` is broadcast: the corpus side stays un-shuffled. */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qe")))
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val scored = c.join(q, col("qid") =!= col("cid"))
      .withColumn("sim", cosine(col("qe"), col("ce")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid").asc)))
      .filter(col("rank") <= k)
      .select(col("qid").as("vec_id"), col("cid").as("nn_id"), col("rank"),
        round(col("sim"), 4).as("sim"))
  }

  /** Rademacher ±1 hyperplane weight for (plane p, dimension d):
    * +1 iff hash60("p|d") is even. */
  private def planeWeight(p: Column, d: Column): Column =
    (TextOps.hash60(concat(p.cast("string"), lit("|"), d.cast("string")))
      .bitwiseAND(1L) * 2L - 1L).cast("double")

  /** LSH bucket id for each vector: `planes` sign bits packed into a long.
    * Pure Catalyst: explodes (vector × plane), one groupBy(vec_id) —
    * shuffle carries one long per (vec, plane). */
  def lshBuckets(vectors: DataFrame, planes: Int): DataFrame = {
    val byPlane = vectors
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(planes - 1), lit(1))).as("plane"))
      .withColumn("proj",
        aggregate(
          zip_with(col("embedding"),
            transform(sequence(lit(0), size(col("embedding")) - 1, lit(1)),
              d => planeWeight(col("plane"), d)),
            (x, w) => x.cast("double") * w),
          lit(0.0), (acc, x) => acc + x))
      .withColumn("bitval",
        when(col("proj") > 0, expr("shiftleft(CAST(1 AS BIGINT), plane)")).otherwise(lit(0L)))
    byPlane.groupBy(col("vec_id")).agg(sum(col("bitval")).as("bucket"))
  }

  /** Bucketed ANN: exact cosine top-k but only within each LSH bucket.
    * Output: (vec_id, nn_id, rank, sim). The pairwise join is per-bucket —
    * with p planes, expected bucket population is n/2^p, so the quadratic
    * term collapses by 4^p/… versus brute force. */
  def lshTopK(vectors: DataFrame, planes: Int, k: Int): DataFrame = {
    val withBucket = vectors.join(lshBuckets(vectors, planes), "vec_id")
    val a = withBucket.select(col("bucket"), col("vec_id").as("qid"), col("embedding").as("qe"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("cid"), col("embedding").as("ce"))
    a.join(b, Seq("bucket")).filter(col("qid") =!= col("cid"))
      .withColumn("sim", cosine(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid").asc)))
      .filter(col("rank") <= k)
      .select(col("qid").as("vec_id"), col("cid").as("nn_id"), col("rank"),
        round(col("sim"), 4).as("sim"))
  }

  /** Embedding-cosine near-duplicate pairs: (id_a, id_b, sim) with
    * sim ≥ threshold, id_a < id_b — brute within LSH buckets. */
  def embeddingNearDups(vectors: DataFrame, planes: Int, simThreshold: Double): DataFrame = {
    val withBucket = vectors.join(lshBuckets(vectors, planes), "vec_id")
    val a = withBucket.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("eb"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("ea"), col("eb")))
      .filter(col("sim") >= simThreshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }
}
