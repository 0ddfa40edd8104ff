package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN parameter-sweep utility: measures recall@k and candidate cost of
  * the hyperplane-LSH path across (planes, tables) settings, against exact
  * brute-force top-k — the recall/cost trade every deployment must pick
  * (`tables` = OR-amplification rounds, `planes` = bucket granularity;
  * Charikar 2002 / classical multi-table LSH).
  *
  * `runMain graft.ops.AnnSweep <embeddingsParquet> [k]` prints one line per
  * setting: recall@k, distinct candidate-pair fraction (the quadratic work
  * actually paid, after multi-table dedup), per-table bucket-join row count
  * (the shuffle paid BEFORE dedup), and wall seconds for the full top-k.
  */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/root/testdata/sf0.1/embeddings.parquet")
    val k = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(path).persist()
    val n = e.count()
    val queries = e.filter(col("vec_id") < 40)
    def pairsOf(df: DataFrame): Set[(Long, Long)] =
      df.filter(col("vec_id") < 40).select("vec_id", "nn_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairsOf(Similarity.bruteTopK(queries, e, k))
    System.err.println(s"n=$n brute pairs=${brute.size}")
    val settings = for {
      planes <- Seq(4, 5, 6, 7, 8)
      tables <- Seq(1, 4, 8, 12)
    } yield (planes, tables)
    settings.foreach { case (planes, tables) =>
      val t0 = System.nanoTime()
      val lsh = pairsOf(Similarity.lshTopK(e, planes, k, tables = tables))
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = (lsh & brute).size.toDouble / brute.size
      // distinct candidate pairs (the post-dedup quadratic work) and the
      // pre-dedup per-table bucket-join volume
      val b = Similarity.lshBuckets(e, planes, tables)
        .groupBy(col("bucket")).agg(count(lit(1)).as("pop"))
        .agg(sum(col("pop") * (col("pop") - 1)).as("raw")).first().getLong(0)
      val distinctPairs = Similarity.lshCandidatePairCount(e, planes, tables)
      val frac = distinctPairs.toDouble / (n.toDouble * (n - 1))
      println(f"planes=$planes%d tables=$tables%2d recall@$k=$recall%.3f " +
        f"cand_frac=$frac%.4f raw_join_rows=$b%d sec=$sec%.1f")
    }
    // PQ-ADC recall vs compression: (m subspaces, kCodes) — bytes/vector
    // = m codes (vs 4·dim float bytes); the recall cost of quantization
    // on this (near-uniform — worst-case) distribution
    val dim = e.select(size(col("embedding"))).first().getInt(0)
    val pqSettings = for {
      m <- Seq(4, 8, 16)
      kc <- Seq(16, 64, 256)
      if kc <= n && dim % m == 0
    } yield (m, kc)
    pqSettings.foreach { case (m, kc) =>
      val t0 = System.nanoTime()
      val pq = pairsOf(Similarity.pqTopK(queries, e, m, kc, iters = 2, k = k))
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = (pq & brute).size.toDouble / brute.size
      val compress = (4.0 * dim) / m
      println(f"pq m=$m%2d kcodes=$kc%3d recall@$k=$recall%.3f " +
        f"compression=${compress}%.0fx sec=$sec%.1f")
    }
    // IVF-PQ composition (q54 default): probe loss × quantization loss —
    // the scan fraction drops to nprobe/kCells on top of PQ's 16× bytes
    Seq((4, 16), (8, 16)).foreach { case (nprobe, kCells) =>
      val t0 = System.nanoTime()
      val c = pairsOf(Similarity.ivfpqTopK(queries, e, kCells, nprobe,
        m = 16, kCodes = 64, iters = 2, k = k))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"ivfpq nprobe=$nprobe%d/$kCells%d m=16 kcodes=64 " +
        f"recall@$k=${(c & brute).size.toDouble / brute.size}%.3f sec=$sec%.1f")
    }
    spark.stop()
  }
}
