package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved micro-A/B of the pop phase over the two snapshot layouts
  * (BENCH.md §0 / VERDICT r3 "what's wrong" #5): the same frontier written
  * (A) partitioned by bucket only vs (B) partitioned by (bucket, popped) —
  * layout B lets the pop's `!popped` filter prune every crawled row's
  * files at the directory level. Alternating timed reads in ONE JVM
  * (min-of-reps per arm) removes the box-drift that defeats whole-crawl
  * A/Bs on this machine.
  *
  * `runMain graft.PopPruneAB [rows] [poppedPct] [reps]`
  */
object PopPruneAB {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(16000000L)
    val poppedPct = args.lift(1).map(_.toInt).getOrElse(50)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "8000000")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = CrawlConfig(batchSize = (rows / 100).toInt, perHostCap = 1000,
      nBuckets = 64)
    val id = col("id")
    val host = when(pmod(id, lit(10)) < 3, lit("hot.example"))
      .otherwise(concat(lit("h"), pmod(id, lit(997)).cast("string"), lit(".example")))
    val frontier = spark.range(rows).select(
        concat(lit("https://"), host, lit("/d"), id.cast("string")).as("url"),
        host.as("host"),
        pmod(id * 2654435761L, lit(1000)).cast("long").as("priority"),
        (pmod(xxhash64(id), lit(100)) < poppedPct).as("popped"))
      .withColumn("bucket", Frontier.bucketCol(col("url"), cfg.nBuckets))
    val base = "/dev/shm/graft-popprune"
    def write(dir: String, cols: Seq[String]): Unit =
      frontier.repartition(col("bucket"))
        .write.mode("overwrite").partitionBy(cols: _*).parquet(dir)
    write(s"$base/a", Seq("bucket"))
    write(s"$base/b", Seq("bucket", "popped"))
    def timedPop(dir: String): Double = {
      val f = spark.read.schema(Snapshots.frontierSchema).parquet(dir)
        .select("url", "host", "bucket", "priority", "popped")
      val t0 = System.nanoTime()
      Frontier.popBatch(f, cfg).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    timedPop(s"$base/a"); timedPop(s"$base/b") // warm-up
    val (as, bs) = (1 to reps).map { _ =>
      (timedPop(s"$base/a"), timedPop(s"$base/b"))
    }.unzip
    println(f"rows=$rows popped=$poppedPct%% A(bucket-only) min=${as.min}%.2f s  " +
      f"B(bucket,popped) min=${bs.min}%.2f s  speedup=${as.min / bs.min}%.2fx")
    // cleanup tmpfs
    import java.util.Comparator
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(base))
    try walk.sorted(Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
    spark.stop()
  }
}
