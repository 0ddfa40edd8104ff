package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main — a BUDGET-AWARE, INCREMENTAL-ARTIFACT orchestrator.
  *
  * The driver records only the last ~2 KB of this process's merged output
  * and needs ONE parseable compact JSON line in it. Rounds 1–3 lost the
  * line to length (the full-name query map outgrew the tail); round 4's
  * compact line never printed because the grown bench (~60 min) outlived
  * the driver's wall-clock window (rc 124). Defenses, in order:
  *
  *  1. CRITERION PHASES FIRST: the long-superstep loop ABBA pairs (the
  *     north rule's two-level scaling evidence), then the kernel pairs
  *     (the BASELINE.json metric), then the query child. Supplementary
  *     phases (sweep, cluster, escalation beyond the base pairs) come
  *     last and are the first to be dropped.
  *  2. The CUMULATIVE compact line re-renders and prints after EVERY
  *     completed phase unit — a mid-run kill leaves the newest complete
  *     line in the tail, carrying everything measured so far.
  *  3. A shutdown hook registered with Hadoop's ShutdownHookManager at
  *     priority 1 — i.e. AFTER Spark's own hooks (priority 40), so ours
  *     is the tail's LAST writer — kills live children and re-prints the
  *     latest line: a SIGTERM leaves a number, not a stack trace.
  *  4. Every phase is gated on wall-clock remaining within
  *     SPARK_GRAFT_BENCH_BUDGET_SEC (default 1200 s — the r3-proven
  *     size; the driver's exact limit is unknown, r4's ~60 min exceeded
  *     it). Gates use MEASURED unit costs (rolling max over observed
  *     walls, seeded from priors) and reserve time for the not-yet-run
  *     criterion phases, so a slow box trims late loop/kernel pairs
  *     rather than losing the kernel headline or the query map.
  *  5. Child stdout+stderr go to a per-child file replayed CAPPED onto
  *     our stderr, so inter-emit log noise cannot flush the line out of
  *     a merged-output tail.
  *
  * Phase semantics, estimators (pair-median headline, control-bracket
  * window gate, floor/step-median cross-checks), codec split, and the
  * recorded run history all live in BENCH.md §0–§3; child measurement
  * code below is unchanged from round 4 — same child protocols, same
  * headline math, identical final-line schema.
  */
object Bench {

  import BenchReport._
  // ---- wall-clock budget ------------------------------------------------
  private val benchT0 = System.nanoTime()
  private def elapsedSec: Double = (System.nanoTime() - benchT0) / 1e9
  private lazy val budgetSec: Double =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1200").toDouble
  private def remainingSec: Double = budgetSec - elapsedSec

  /** Measured cost of one phase-unit type: a prior, then the MAX
    * observed unit wall (gating must be pessimistic). */
  private final class Cost(prior: Double) {
    @volatile private var est = prior
    def sec: Double = est
    def timed[T](f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      est = math.max(est, (System.nanoTime() - t0) / 1e9)
      r
    }
  }

  private val warehouseDir: String =
    (if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else
      System.getProperty("java.io.tmpdir")) + "/graft-bench-warehouse"

  private def session(cpus: Int): SparkSession = {
    // Literal multi-executor mode (north rule "spark-submit ... N and 4N
    // executors"): SPARK_GRAFT_MASTER_OVERRIDE=local-cluster[...] makes
    // this a real standalone mini-cluster — one JVM per executor, netty
    // shuffle, RPC broadcast. Must be entered via spark-submit (a plain-
    // java driver fails executor-side lambda deserialization).
    val masterOverride = sys.env.get("SPARK_GRAFT_MASTER_OVERRIDE")
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_TOTAL_CORES", cpus.toString)
    val b0 = SparkSession.builder()
      .master(masterOverride.getOrElse(s"local[$cpus]"))
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
    val b1 = masterOverride match {
      case Some(m) =>
        val cm = "local-cluster\\[\\d+,(\\d+),(\\d+)\\]".r.findFirstMatchIn(m)
        val execCores = cm.map(_.group(1)).getOrElse("2")
        val execMemMb = cm.map(_.group(2)).getOrElse("8192")
        // executor -Xmx = spark.executor.memory (the master string only
        // sizes the worker)
        b0.config("spark.executor.memory", s"${execMemMb}m")
          .config("spark.executor.extraJavaOptions",
            s"-XX:ActiveProcessorCount=$execCores")
          // one host: all NODE_LOCAL; a locality wait only idles (A/B'd)
          .config("spark.locality.wait",
            sys.env.getOrElse("SPARK_GRAFT_LOCALITY_WAIT", "0s"))
      case None => b0
    }
    val s = b1
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // shuffle/spill on tmpfs: disk jitter would dominate the scaling
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.warehouse.dir", warehouseDir)
      // v2 commit: atomicity rests on the manifest pointer rename
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      // measured-neutral/-worse knobs kept for re-testing (BENCH.md §0)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_THRESHOLD", "0b"))
      .config("spark.sql.maxConcurrentOutputFileWriters",
        sys.env.getOrElse("SPARK_GRAFT_CONCURRENT_WRITERS", "0"))
      // keep the politeness top-k hash-based with many hosts per task
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "8000000")
      // codec split (measured, BENCH.md §0): parquet=zstd, shuffle=lz4
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4"))
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_PARQUET_CODEC", "zstd"))
      .config("spark.shuffle.compress",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_GRAFT_DRIVER_MEM", "8g"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** The long-point corpus as a BUCKETED table on doc_id (the 100 TB
    * shape: the fetch join co-partitions, the corpus never shuffles);
    * the in-memory catalog forgets metadata across sessions, so each
    * level re-declares the layout via DDL. */
  private val CorpusTable = "graft_bench_corpus"
  private val ClusterCorpusTable = "graft_bench_corpus_cluster"
  private val CorpusBuckets = 64

  private def dropCorpusLocation(table: String = CorpusTable): Unit = {
    import java.util.Comparator
    val root = java.nio.file.Paths.get(s"$warehouseDir/$table")
    if (java.nio.file.Files.isDirectory(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(q => java.nio.file.Files.deleteIfExists(q))
      finally walk.close()
    }
  }

  private def declareCorpusTable(spark: SparkSession,
                                 table: String = CorpusTable): Unit = {
    import spark.implicits._
    val schemaDdl = spark.emptyDataset[Doc].toDF().schema.toDDL
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"""CREATE TABLE $table ($schemaDdl) USING PARQUET
         |CLUSTERED BY (doc_id) SORTED BY (doc_id) INTO $CorpusBuckets BUCKETS
         |LOCATION '$warehouseDir/$table'""".stripMargin)
  }

  /** Generate the bucketed corpus ONCE, full-box (both levels then
    * crawl the identical stored files). */
  private def writeCorpusTable(table: String, nDocs: Int): Unit = {
    val sg = session(32)
    dropCorpusLocation(table)
    Corpus.documents(sg, 42L, nDocs).toDF()
      .repartition(CorpusBuckets, col("doc_id"))
      .write.bucketBy(CorpusBuckets, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable(table)
    sg.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
  }

  // ---- measurements (child-side) ----------------------------------------
  /** Frontier-throughput KERNEL (the BASELINE metric's dataflow): pop +
    * link-dedup + merge over a skewed frontier, no checkpoint IO. */
  private def timedKernel(spark: SparkSession, f: Long, l: Long,
                          reps: Int): (Long, Double) = {
    // perHostCap stays realistic (politeness): hot host ≤ 16*cap rows
    val cfg = CrawlConfig(batchSize = (f / 10).toInt, perHostCap = 1000,
      nBuckets = 64, saltBuckets = 16)
    val id = col("id")
    val host = when(pmod(id, lit(10)) < 3, lit("hot.example"))
      .otherwise(concat(lit("h"), pmod(id, lit(997)).cast("string"), lit(".example")))
    val frontier = spark.range(f).select(
        concat(lit("https://"), host, lit("/d"), id.cast("string")).as("url"),
        host.as("host"),
        pmod(id * 2654435761L, lit(1000)).cast("long").as("priority"),
        (pmod(id, lit(5)) === 0).as("popped"))
      .withColumn("bucket", Frontier.bucketCol(col("url"), cfg.nBuckets))
      .persist()
    frontier.count()
    val tid = pmod(xxhash64(id), lit(f * 2)) // ~50% hit existing frontier urls
    val lhost = when(pmod(tid, lit(10)) < 3, lit("hot.example"))
      .otherwise(concat(lit("h"), pmod(tid, lit(997)).cast("string"), lit(".example")))
    val links = spark.range(l).select(
        concat(lit("https://"), lhost, lit("/d"), tid.cast("string")).as("url"),
        lhost.as("host"),
        (pmod(id, lit(3)) + 1).cast("long").as("weight"))
      .persist()
    links.count()

    def runOnce(): Unit = {
      val pop = Frontier.popBatch(frontier, cfg)
      val merged = Frontier.merge(frontier, links, pop.select("url", "host"), cfg)
      forceEval(merged.select("url", "host", "bucket", "priority", "popped"))
    }
    // warm once (codegen/AQE planning), then best-of-reps (robust floor)
    runOnce()
    val sec = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      runOnce()
      (System.nanoTime() - t0) / 1e9
    }.min
    frontier.unpersist(); links.unpersist()
    (l + cfg.batchSize, sec)
  }

  private val ctlDocsCache = // probe fixtures: generation is setup
    new java.util.concurrent.ConcurrentHashMap[Int, Array[(String, String)]]()

  /** Pure string/parse scaling control — NO Spark: the loop's per-doc
    * work (regex links + URI admission) on a plain thread pool; its N→4N
    * efficiency is the MACHINE's same-window ceiling (BENCH.md §2.1). */
  private def timedParseControl(nDocs: Int, threads: Int, reps: Int): Double = {
    val docs = ctlDocsCache.computeIfAbsent(nDocs, n =>
      (0L until n.toLong).toArray.map { i =>
        val d = Corpus.genDoc(42L, i, n)
        (d.doc_id, Parser.htmlOf(d.spans))
      })
    def once(): Long = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val chunk = math.max(1, docs.length / (threads * 8))
      val futures = docs.grouped(chunk).map { g =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            var n = 0L
            g.foreach { case (u, h) => n += Parser.extractLinks(u, h, 250, 1L).length }
            n
          }
        })
      }.toSeq
      val total = futures.map(_.get()).sum
      pool.shutdown()
      total
    }
    once()
    (1 to reps).map { _ =>
      val t0 = System.nanoTime(); once(); (System.nanoTime() - t0) / 1e9
    }.min
  }

  /** Pure-CPU scaling control (chained-hash aggregate, no shuffle/IO):
    * the machine's thread-scaling ceiling. */
  private def timedCpuControl(spark: SparkSession, n: Long, reps: Int): Double = {
    var c: org.apache.spark.sql.Column = col("id")
    (0 until 16).foreach(i => c = xxhash64(c, lit(i)))
    // mask before summing: ANSI mode would overflow a sum of full-range longs
    val df = spark.range(n).select(sum(c.bitwiseAND(lit(0xffffL))))
    def once(): Unit = { val _ = df.first() }
    once()
    (1 to reps).map { _ =>
      val t0 = System.nanoTime(); once(); (System.nanoTime() - t0) / 1e9
    }.min
  }

  private def tmpRoot: java.nio.file.Path =
    if (new java.io.File("/dev/shm").isDirectory) java.nio.file.Paths.get("/dev/shm")
    else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))

  /** One timed crawl on tmpfs state; multi-million-doc corpora come from
    * the stored bucketed table and each superstep SCANS it (the realistic
    * shape); small sweep corpora stay cached. Per-superstep (urls, s). */
  private def timedCrawl(spark: SparkSession, nDocs: Int, nSeeds: Int,
                         batches: Int, batchSize: Int,
                         corpusTable: Option[String] = None): (Seq[Long], Seq[Double]) = {
    import spark.implicits._
    val stateDir = java.nio.file.Files
      .createTempDirectory(tmpRoot, "graft-bench-crawl").toString
    // perHostCap = batchSize: politeness off (~8 synthetic hosts);
    // hostTopKSpillBound raised so the heap pop — the politeness-sized
    // production path — stays the measured form (library default is
    // conservative, Frontier.popBatch)
    val cfg = CrawlConfig(batchSize = batchSize, perHostCap = batchSize,
      hostTopKSpillBound = Int.MaxValue,
      splitSnapshotsByPopped = sys.env.contains("SPARK_GRAFT_POPPED_SPLIT"),
      maxBatches = batches, nBuckets = 64, saltBuckets = 16, minTokens = 50)
    // corpus materialized BEFORE the clock starts (metric = frontier thr)
    val docs = corpusTable match {
      case Some(t) => spark.table(t)
      case None =>
        val d = Corpus.documents(spark, 42L, nDocs).toDF().persist()
        d.count(); d
    }
    val robots = Corpus.robots(spark).toDF()
    val seeds = spark.range(nSeeds)
      .map(i => Seed(Corpus.urlFor(i, nDocs), 1L)).toDF()
    val res = CrawlLoop.run(spark, docs, robots, seeds, cfg, stateDir,
      seed = 42L, nDocs = nDocs)
    if (corpusTable.isEmpty) docs.unpersist()
    // per-superstep elapsed, excluding session/corpus setup
    val perBatchSec = res.batches.map(_.elapsedMs / 1e3)
    val perBatchUrls = res.batches.map(b => b.popped + b.linksExtracted)
    // tmpfs hygiene: dead state dirs would sit in RAM for the box's lifetime
    import java.util.Comparator
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(stateDir))
    try walk.sorted(Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
    (perBatchUrls, perBatchSec)
  }

  private def forceEval(df: DataFrame): Unit = // full materialization
    df.write.format("noop").mode("overwrite").save()

  private def pLowEnv: Int = sys.env.getOrElse("SPARK_GRAFT_P_LOW", "2").toInt
  private def benchModeEnv: String =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_MODE", "full")
  private def sweepSpecEnv: Seq[Int] =
    sys.env.getOrElse("SPARK_GRAFT_LOOP_SWEEP", "6,2")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).filter(_ > 0).toSeq
  private def longPointEnv: Option[(Int, Int)] = {
    // 3 supersteps of 1.2M (2 steady after the bootstrap drop) — the shape
    // every r3/r4 recorded run used; a 1-steady-step shape was measured
    // and rejected (BENCH.md §2.1)
    val longSpec = sys.env.getOrElse("SPARK_GRAFT_LOOP_LONG", "3600000x3")
    longSpec.split("x") match {
      case Array(d, b) if longSpec.nonEmpty => Some((d.trim.toInt, b.trim.toInt))
      case _ => None
    }
  }

  // ---- child-JVM phase entries ------------------------------------------
  /** Child-JVM entry: ONE phase at ONE parallelism level, results to
    * `outPath`. The parent caps the child with -XX:ActiveProcessorCount=p
    * so GC/JIT/common-pool threads match the simulated node size. */
  private def runLevel(p: Int, outPath: String, phase: String): Unit = {
    val w = new java.io.PrintWriter(outPath)
    try phase match {
      case "looplong" => runLooplong(p, w)
      case "queries"  => runQueries(w)
      case "sweep"    => runSweep(p, w)
      case "kernelcluster" => runKernelCluster(p, w)
      case _          => runKernelPhase(p, w)
    } finally w.close()
  }

  /** Kernel only — cluster mode (this JVM is the driver; thread controls
    * in it would not probe the executors' scaling). */
  private def runKernelCluster(p: Int, w: java.io.PrintWriter): Unit = {
    val kf = sys.env.getOrElse("SPARK_GRAFT_KERNEL_FRONTIER", "4000000").toLong
    val s = session(p)
    val (ku, kt) = timedKernel(s, kf, kf * 2, reps = 3)
    s.stop()
    w.println(s"ku=$ku")
    w.println(f"kt=$kt%.6f")
  }

  private def runKernelPhase(p: Int, w: java.io.PrintWriter): Unit = {
    val pLow = pLowEnv
    val kf = sys.env.getOrElse("SPARK_GRAFT_KERNEL_FRONTIER", "4000000").toLong
    val cpuNCtl = sys.env.getOrElse("SPARK_GRAFT_CPU_CONTROL_N", "40000000").toLong
    val str = timedParseControl(150000, p, reps = 2)
    val s = session(p)
    val (ku, kt) = timedKernel(s, kf, kf * 2, reps = if (p == pLow) 2 else 3)
    val cpu = timedCpuControl(s, cpuNCtl, reps = 2)
    s.stop()
    w.println(f"str=$str%.6f")
    w.println(s"ku=$ku")
    w.println(f"kt=$kt%.6f")
    w.println(f"cpu=$cpu%.6f")
  }

  private def runSweep(p: Int, w: java.io.PrintWriter): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "120000").toInt
    val nSeeds = math.max(nDocs / 12, 2)
    val s = session(p)
    sweepSpecEnv.foreach { nb =>
      val (u, t) = timedCrawl(s, nDocs, nSeeds, nb, nDocs / nb)
      w.println(f"loop=$nb,$nDocs,${u.sum},${t.sum}%.6f")
    }
    s.stop()
  }

  /** One long-point rep: priming mini-crawl (untimed per-JVM codegen/JIT
    * warm-up; the metric is steady-state throughput, like the reference
    * monitor's urls/s, src/monitor.rs:141-156), then ONE timed crawl of
    * the shared bucketed corpus. Seeds = one full batch so superstep 0
    * pops at full width; the parent drops superstep 0 (bootstrap). */
  private def runLooplong(p: Int, w: java.io.PrintWriter): Unit = {
    val (d, b) = longPointEnv.getOrElse(sys.error("looplong: no long point"))
    val table = sys.env.getOrElse("SPARK_GRAFT_CORPUS_TABLE", CorpusTable)
    val s = session(p)
    declareCorpusTable(s, table)
    val _ = timedCrawl(s, 36000, 3000, 1, 36000) // priming, untimed
    val (urls, secs) = timedCrawl(s, d, d / b, b, d / b,
      corpusTable = Some(table))
    s.stop()
    w.println("lsteps=" + urls.zip(secs)
      .map { case (u, t) => f"$u:$t%.6f" }.mkString(","))
  }

  /** Per-query timings in a dedicated full-width JVM, min of 2 reps per
    * query forced through full materialization (noop sink), + ANN recall
    * (no contention from earlier phases, BENCH.md §3). Under
    * SPARK_GRAFT_QUERIES_BUDGET_SEC (set from the orchestrator's
    * remaining wall budget) the child degrades gracefully: rep 1 of
    * every query always runs (a complete map beats a polished partial
    * one); rep 2s and the ANN recall only while the sub-budget holds —
    * a min-of-1 tail only ever reads HIGH (one floor sample lost). */
  private def runQueries(w: java.io.PrintWriter): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qBudget = sys.env.get("SPARK_GRAFT_QUERIES_BUDGET_SEC").map(_.toDouble)
    val qT0 = System.nanoTime()
    def within(reserveSec: Double): Boolean =
      qBudget.forall(b => (System.nanoTime() - qT0) / 1e9 < b - reserveSec)
    val s32 = session(32)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try forceEval(fn(s32, sfDir))
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      val r1 = once()
      val sec = if (within(45)) math.min(r1, once()) else r1
      w.println(f"q=$name,$sec%.6f")
    }
    if (within(5)) try {
      import graft.ops.Similarity
      val e = s32.read.parquet(s"$sfDir/embeddings.parquet")
      val queriesDf = e.filter(col("vec_id") < 40)
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.filter(col("vec_id") < 40).select("vec_id", "nn_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = pairs(Similarity.bruteTopK(queriesDf, e, k = 3))
      // q28's sweep-chosen setting (SURVEY §8.3): 8 tables x 5 planes
      val lsh = pairs(Similarity.lshTopK(e, planes = 5, k = 3, tables = 8))
      val ivf = pairs(Similarity.ivfTopK(queriesDf, e, kCells = 16, nprobe = 4, k = 3))
      // PQ recalls in their OWN guards: a PQ-only regression must not
      // erase the lsh/ivf numbers from the artifact (-1.0 marks failed)
      def guarded(tag: String)(df: => org.apache.spark.sql.DataFrame): Double =
        try (pairs(df) & brute).size.toDouble / brute.size
        catch { case ex: Throwable =>
          System.err.println(s"[bench] $tag: ${ex.getMessage}"); -1.0 }
      val pqR = guarded("pq_recall")(
        Similarity.pqTopK(queriesDf, e, m = 16, kCodes = 64, iters = 2, k = 3))
      val ivfpqR = guarded("ivfpq_recall")(Similarity.ivfpqTopK(queriesDf, e,
        kCells = 16, nprobe = 4, m = 16, kCodes = 64, iters = 2, k = 3))
      w.println(f"ann=${(lsh & brute).size.toDouble / brute.size}%.6f," +
        f"${(ivf & brute).size.toDouble / brute.size}%.6f,$pqR%.6f,$ivfpqR%.6f")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] ann_recall: ${e.getMessage}")
    } else System.err.println("[bench] ann_recall skipped (queries sub-budget)")
    s32.stop()
  }

  // ---- child spawning ----------------------------------------------------
  /** App jar for spark-submit children (the class-distribution path a
    * real cluster uses); sbt's exploded classes dir is jarred once. */
  private lazy val appJar: String = {
    val root = java.nio.file.Paths.get(
      Bench.getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
    if (!java.nio.file.Files.isDirectory(root)) root.toString // already a jar
    else {
      val jar = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft-bench-app.jar")
      val jos = new java.util.jar.JarOutputStream(
        java.nio.file.Files.newOutputStream(jar))
      val walk = java.nio.file.Files.walk(root)
      try walk.filter(java.nio.file.Files.isRegularFile(_)).forEach { f =>
        jos.putNextEntry(new java.util.zip.ZipEntry(
          root.relativize(f).toString.replace(java.io.File.separatorChar, '/')))
        java.nio.file.Files.copy(f, jos)
        jos.closeEntry()
      } finally { walk.close(); jos.close() }
      jar.toString
    }
  }

  /** Live children, killed by the shutdown hook so a parent SIGTERM doesn't
    * leave orphans streaming log noise into the driver's tail. */
  private val liveChildren =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Process]()

  /** Launch one (level, phase) child in its own capped JVM; cluster
    * children (master override in extraEnv) go through spark-submit.
    * Child output goes to a file replayed CAPPED onto our stderr — the
    * parent's stdout carries ONLY compact artifact lines. */
  private def spawnChild(p: Int, phase: String,
                         extraEnv: Map[String, String] = Map.empty): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val out = java.nio.file.Files.createTempFile("graft-bench-level", ".txt")
    val childLog = java.nio.file.Files.createTempFile("graft-bench-level", ".log")
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val inherited = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(_.startsWith("-XX:ActiveProcessorCount"))
    val cmd = extraEnv.get("SPARK_GRAFT_MASTER_OVERRIDE") match {
      case Some(master) =>
        val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
        val driverMem = inherited.find(_.startsWith("-Xmx"))
          .map(_.drop(4)).getOrElse("16g")
        // spark-class injects the JDK17 module options; add only the fixed
        // processor cap (executor count is the sole scaled resource)
        val driverOpts = (inherited.filter(_.startsWith("-XX:+Use")) ++ Seq(
          s"-XX:ActiveProcessorCount=$p",
          "-Dspark.ui.enabled=false",
          "-Dspark.sql.session.timeZone=UTC")).mkString(" ")
        Seq(s"$sparkHome/bin/spark-submit",
          "--master", master,
          "--driver-memory", driverMem,
          "--driver-java-options", driverOpts,
          "--class", "graft.Bench", appJar,
          "level", p.toString, out.toString, phase)
      case None =>
        Seq(javaBin) ++ inherited ++ Seq(
          s"-XX:ActiveProcessorCount=$p",
          "-cp", System.getProperty("java.class.path"),
          "graft.Bench", "level", p.toString, out.toString, phase)
    }
    val pb = new ProcessBuilder(cmd.asJava)
    extraEnv.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.redirectErrorStream(true)
    pb.redirectOutput(childLog.toFile)
    val proc = pb.start()
    liveChildren.add(proc)
    val rc = try proc.waitFor() finally liveChildren.remove(proc)
    val logged = new String(java.nio.file.Files.readAllBytes(childLog), "UTF-8")
    if (logged.nonEmpty) {
      val cap = 4000
      System.err.print(
        if (logged.length <= cap) logged
        else s"...[child log ${logged.length - cap} B trimmed]...\n" +
          logged.takeRight(cap))
    }
    java.nio.file.Files.deleteIfExists(childLog)
    require(rc == 0, s"bench $phase-$p child JVM exited $rc")
    val lines = new String(java.nio.file.Files.readAllBytes(out), "UTF-8")
      .split("\n").toSeq
    java.nio.file.Files.deleteIfExists(out)
    lines
  }

  private def spawnKernel(p: Int): KRes = {
    val lines = spawnChild(p, "kernel")
    def v(k: String): String =
      lines.find(_.startsWith(k + "=")).getOrElse(sys.error(s"kernel-$p: no $k"))
        .drop(k.length + 1)
    (v("str").toDouble, v("ku").toLong, v("kt").toDouble, v("cpu").toDouble)
  }

  private def spawnSweep(p: Int): Seq[(Int, Int, Long, Double)] =
    spawnChild(p, "sweep").filter(_.startsWith("loop=")).map { l =>
      val Array(nb, nd, u, t) = l.drop(5).split(",")
      (nb.toInt, nd.toInt, u.toLong, t.toDouble)
    }

  private def spawnLooplong(p: Int,
                            extraEnv: Map[String, String] = Map.empty): LongRep = {
    val lines = spawnChild(p, "looplong", extraEnv)
    val steps = lines.find(_.startsWith("lsteps="))
      .getOrElse(sys.error(s"looplong-$p: no lsteps")).drop(7)
      .split(",").toSeq.map { s =>
        val Array(u, t) = s.split(":"); (u.toLong, t.toDouble)
      }
    LongRep(steps.map(_._1), steps.map(_._2))
  }

  private def clusterExecCores: Int =
    sys.env.getOrElse("SPARK_GRAFT_CLUSTER_EXEC_CORES", "1").toInt
  private def clusterEnv(nExec: Int): Map[String, String] = {
    val mem = sys.env.getOrElse("SPARK_GRAFT_CLUSTER_EXEC_MEM", "8192").toInt
    Map(
      "SPARK_GRAFT_MASTER_OVERRIDE" -> s"local-cluster[$nExec,$clusterExecCores,$mem]",
      "SPARK_GRAFT_TOTAL_CORES" -> (nExec * clusterExecCores).toString)
  }

  private def spawnKernelCluster(nExec: Int): (Long, Double) = {
    val lines = spawnChild(8, "kernelcluster", clusterEnv(nExec))
    def v(k: String): String =
      lines.find(_.startsWith(k + "=")).getOrElse(sys.error(s"kernelcluster-$nExec: no $k"))
        .drop(k.length + 1)
    (v("ku").toLong, v("kt").toDouble)
  }

  private def spawnQueries(budgetSec: Double): (Seq[(String, Double)], Option[(Double, Double, Double, Double)]) = {
    val lines = spawnChild(32, "queries",
      Map("SPARK_GRAFT_QUERIES_BUDGET_SEC" -> f"$budgetSec%.0f"))
    val qs = lines.filter(_.startsWith("q=")).map { l =>
      val Array(n, t) = l.drop(2).split(","); (n, t.toDouble)
    }
    val ann = lines.find(_.startsWith("ann=")).map { l =>
      val f = l.drop(4).split(",")
      (f(0).toDouble, f(1).toDouble, f(2).toDouble,
        f.lift(3).map(_.toDouble).getOrElse(-1.0))
    }
    (qs, ann)
  }

  // ---- orchestration -----------------------------------------------------
  def main(args: Array[String]): Unit = args match {
    case Array("level", p, out)        => runLevel(p.toInt, out, "main")
    case Array("level", p, out, phase) => runLevel(p.toInt, out, phase)
    case _ => orchestrate()
  }

  /** A failed phase LOGS AND CONTINUES: one broken child must not cost
    * the run its artifact (rc 0 + what landed beats rc 1 + nothing). */
  private def phaseTry[T](what: String)(body: => T): Option[T] =
    try Some(body) catch {
      case e: Throwable =>
        System.err.println(s"[bench] phase $what FAILED: ${e.getMessage}")
        None
    }

  private def orchestrate(): Unit = {
    val benchMode = benchModeEnv
    val pLow = pLowEnv
    val pHigh = pLow * 4

    if (benchMode == "control") {
      val strN = timedParseControl(150000, pLow, reps = 2)
      val str4N = timedParseControl(150000, pHigh, reps = 3)
      val e = (strN / str4N) / 4.0
      println(f"""{"string_control":{"sec_pN":$strN%.2f,"sec_p4N":$str4N%.2f,"efficiency":$e%.3f}}""")
      return
    }

    val kernelOnly = benchMode == "kernel"
    val loopOnly = benchMode == "loop"
    val queriesOnly = benchMode == "queries"
    val clusterOnly = benchMode == "cluster"
    val doLoop = !kernelOnly && !queriesOnly && !clusterOnly
    val doKernel = !loopOnly && !queriesOnly && !clusterOnly
    val doQueries = !loopOnly && !kernelOnly && !clusterOnly
    val doCluster = benchMode == "full" || clusterOnly

    // unit-cost priors (seconds; rolling max once observed) — sized from
    // the recorded r3/r4 runs (BENCH.md): loop pair ≈ 5 min on a loaded
    // box, kernel pair ≈ 2 min, query child ≈ 4 min
    def prior(k: String, d: Double): Double =
      sys.env.get(s"SPARK_GRAFT_COST_$k").map(_.toDouble).getOrElse(d)
    val loopPairCost = new Cost(prior("LOOP_PAIR", 300))
    val kernelPairCost = new Cost(prior("KERNEL_PAIR", 120))
    val queriesCost = new Cost(prior("QUERIES", 240))
    val sweepCost = new Cost(prior("SWEEP", 130))
    val clusterKernelCost = new Cost(prior("CLUSTER_KERNEL_PAIR", 240))
    val clusterLoopCost = new Cost(prior("CLUSTER_LOOP_PAIR", 420))

    val state = new BenchReport.State
    installShutdownHook()
    emit(state) // a floor line exists from second 0

    // Reserves: time owed to not-yet-run criterion phases — optional
    // units run only if the budget holds after paying them. PRIORITY
    // (what a squeezed window keeps): loop pairs (the criterion needs
    // >= 2 bracketed samples) > kernel pair 1 (the BASELINE metric) >
    // the query child (its sub-budget degrades before dropping) >
    // supplementary. So loop pairs reserve ONLY kernel pair 1; kernel
    // pairs 2+ and supplementary also reserve the query child.
    def kernelReserve: Double =
      if (doKernel && state.kernelPairs.isEmpty) kernelPairCost.sec else 0.0
    def queriesReserve: Double =
      if (doQueries && state.queries.isEmpty) queriesCost.sec else 0.0
    def gate(what: String, cost: Double, mandatory: Boolean = false,
             reserve: => Double = kernelReserve + queriesReserve,
             allow: Double = 0.0): Boolean = {
      val need = cost * 1.1 + (if (mandatory) 0.0 else reserve) - allow
      val ok = mandatory || remainingSec > need
      if (!ok) System.err.println(
        f"[bench] SKIP $what: ${remainingSec}%.0f s left < ${need}%.0f s needed" +
          f" (budget $budgetSec%.0f)")
      ok
    }
    // Bounded overshoot allowance, spent ONLY on reaching the loop
    // criterion's minimum sample count: one ratio is no median, and a
    // dirty-window single pair reads arbitrarily flattering (a 1.227
    // sample behind a 0.747 bracket — BENCH.md §2.2). Worst-case wall =
    // budget + overshoot + mandatory kernel pair ≈ 23 min at defaults.
    val overshootSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OVERSHOOT_SEC", "180").toDouble
    val minPairs = sys.env.getOrElse("SPARK_GRAFT_LOOP_PAIRS_MIN", "2").toInt

    // window probe (~15 s): no-Spark string control at both levels;
    // consecutive loop pairs SHARE a bracket (pair i's post = i+1's pre)
    def ctlWindowEff(): Double = {
      val n = timedParseControl(150000, pLow, reps = 3)
      val h = timedParseControl(150000, pHigh, reps = 3)
      (n / h) / 4.0
    }

    // ---- phase 1 (CRITERION, coldest window): long-superstep loop
    // point as interleaved (N, 4N) ABBA child-JVM pairs; headline =
    // control-gated median of per-pair whole-run ratios (render()) ----
    val nPairs = sys.env.getOrElse("SPARK_GRAFT_LOOP_PAIRS", "3").toInt
    val maxPairs = sys.env.getOrElse("SPARK_GRAFT_LOOP_PAIRS_MAX", "5").toInt
    // experiment knob (BENCH.md §0 exp 4); never set on criterion runs
    val loopCodecAb: Seq[String] =
      sys.env.getOrElse("SPARK_GRAFT_LOOP_CODEC_AB", "")
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    if (doLoop) longPointEnv.foreach { case (d, b) =>
      val gen = phaseTry("corpus-gen")(writeCorpusTable(CorpusTable, d))
      if (gen.isDefined) {
        state.longPoint = Some((d, b))
        // settle after the full-box corpus write: its teardown crushes a
        // 2-thread control taken immediately after (a 0.144 pre-bracket
        // against a 0.977 post, BENCH.md §2.1b) and unfairly dirties
        // pair 1 — one discarded probe + a short sleep decays the state
        Thread.sleep(5000)
        val _ = ctlWindowEff()
        var lastCtl = ctlWindowEff()
        var i = 0
        var go = true
        while (go) {
          i += 1
          val codecEnv: Map[String, String] =
            if (loopCodecAb.isEmpty) Map.empty
            else Map("SPARK_GRAFT_IO_CODEC" -> loopCodecAb((i - 1) % loopCodecAb.size))
          System.err.println(s"[bench] long-point pair $i" +
            codecEnv.values.map(c => s" (io codec $c)").mkString)
          loopPairCost.timed {
            phaseTry(s"loop pair $i") {
              val (lo, hi) =
                if (i % 2 == 1) (spawnLooplong(pLow, codecEnv), spawnLooplong(pHigh, codecEnv))
                else { val h = spawnLooplong(pHigh, codecEnv); (spawnLooplong(pLow, codecEnv), h) }
              val post = ctlWindowEff()
              System.err.println(f"[bench] pair $i ctl brackets $lastCtl%.3f/$post%.3f")
              state.loopPairs :+= LoopPair(lo, hi,
                math.min(lastCtl, post), math.max(lastCtl, post))
              lastCtl = post
            }
          }
          emit(state)
          def pairRatio(p: LoopPair): Double =
            (p.lo.secs.drop(1).sum / p.hi.secs.drop(1).sum) / 4.0
          val rs = state.loopPairs.map(pairRatio)
          // escalate past nPairs only while the window is visibly noisy
          // (marginal median / wide spread / < 2 clean brackets) AND the
          // budget covers a pair after full reserves (BENCH.md §0 item 6)
          val noisy = rs.nonEmpty && (median(rs) < 0.85 ||
            rs.max - rs.min > 0.25 ||
            state.loopPairs.count(p => pairClean(p.ctl, p.ctlHi)) < 2)
          go =
            if (i < nPairs)
              gate(s"loop pair ${i + 1}", loopPairCost.sec,
                reserve = kernelReserve,
                allow = if (i < minPairs) overshootSec else 0.0)
            else if (i < maxPairs && noisy) {
              val fits = gate(s"escalation pair ${i + 1}", loopPairCost.sec)
              if (fits) System.err.println(
                f"[bench] loop pairs noisy (median ${median(rs)}%.3f, " +
                  f"spread ${rs.max - rs.min}%.3f, clean ${state.loopPairs.count(p => pairClean(p.ctl, p.ctlHi))}) — adding pair ${i + 1}")
              fits
            } else false
        }
        dropCorpusLocation() // free the tmpfs table before later phases
      }
    }

    // ---- phase 2 (CRITERION): kernel + controls, ABBA child pairs ----
    val nKernelPairs = sys.env.getOrElse("SPARK_GRAFT_KERNEL_PAIRS", "3").toInt
    if (doKernel) {
      var i = 0
      var go = gate("kernel pair 1", kernelPairCost.sec, mandatory = true)
      while (go && i < nKernelPairs) {
        i += 1
        System.err.println(s"[bench] kernel pair $i/$nKernelPairs")
        kernelPairCost.timed {
          phaseTry(s"kernel pair $i") {
            val pr =
              if (i % 2 == 1) (spawnKernel(pLow), spawnKernel(pHigh))
              else { val hi = spawnKernel(pHigh); (spawnKernel(pLow), hi) }
            state.kernelPairs :+= pr
          }
        }
        emit(state)
        go = i < nKernelPairs && gate(s"kernel pair ${i + 1}", kernelPairCost.sec)
      }
    }

    // ---- phase 3 (CRITERION): query child under a sub-budget derived
    // from what's left (see runQueries); attempted whenever a rep-1
    // sweep could still fit ----
    if (doQueries && remainingSec > 45) {
      val subBudget = math.max(100.0, remainingSec - 30)
      queriesCost.timed {
        phaseTry("queries") {
          val (qs, ann) = spawnQueries(subBudget)
          state.queries = qs
          state.ann = ann
        }
      }
      emit(state)
    } else if (doQueries)
      System.err.println(f"[bench] SKIP queries: ${remainingSec}%.0f s left")

    // ---- phase 4 (supplementary): small-corpus loop sweep; criterion
    // only when the long point is disabled (headline falls back to it)
    if (doLoop && sweepSpecEnv.nonEmpty &&
        gate("sweep", sweepCost.sec, mandatory = longPointEnv.isEmpty)) {
      sweepCost.timed {
        phaseTry("sweep") {
          state.sweepN = spawnSweep(pLow)
          state.sweep4 = spawnSweep(pHigh)
        }
      }
      emit(state)
    }

    // ---- phase 5 (supplementary): LITERAL executor-count scaling —
    // "spark-submit ... N and 4N executors" as real standalone
    // mini-clusters, 2 -> 8 single-core executor JVMs (rationale +
    // A/Bs: BENCH.md §1b). Thread pairs stay the headline. ----
    val clusterPairsN =
      if (!doCluster) 0
      else sys.env.getOrElse("SPARK_GRAFT_CLUSTER_PAIRS", "2").toInt
    val clusterPoint: Option[(Int, Int)] =
      sys.env.getOrElse("SPARK_GRAFT_CLUSTER_LOOP_LONG", "2400000x2")
        .split("x") match {
          case Array(d, b) => Some((d.trim.toInt, b.trim.toInt))
          case _ => None
        }
    val execsLow = sys.env.getOrElse("SPARK_GRAFT_CLUSTER_EXECS_LOW", "2").toInt
    val execsHigh = sys.env.getOrElse("SPARK_GRAFT_CLUSTER_EXECS_HIGH", "8").toInt
    def clusterAbba[T](i: Int, run: Int => T): (T, T) =
      if (i % 2 == 1) (run(execsLow), run(execsHigh))
      else { val h = run(execsHigh); (run(execsLow), h) }
    if (clusterPairsN > 0) {
      // kernel pairs in the cluster phase; 0 lets a sample-only run go
      // straight to the loop point (quiet-window hunting, BENCH.md §1b)
      val nCk = sys.env.getOrElse("SPARK_GRAFT_CLUSTER_KERNEL_PAIRS", "2").toInt
      var i = 0
      var go = gate("cluster kernel pair 1", clusterKernelCost.sec,
        mandatory = clusterOnly)
      while (go && i < nCk) {
        i += 1
        System.err.println(s"[bench] cluster kernel pair $i (execs $execsLow vs $execsHigh)")
        clusterKernelCost.timed {
          phaseTry(s"cluster kernel pair $i") {
            state.clusterKernelPairs :+= clusterAbba(i, spawnKernelCluster)
          }
        }
        emit(state)
        go = i < nCk && gate(s"cluster kernel pair ${i + 1}", clusterKernelCost.sec)
      }
      clusterPoint.foreach { case (d, b) =>
        if (gate("cluster loop", clusterLoopCost.sec + 90,
            mandatory = clusterOnly)) {
          val gen = phaseTry("cluster corpus-gen")(
            writeCorpusTable(ClusterCorpusTable, d))
          if (gen.isDefined) {
            state.clusterPoint = Some((d, b))
            val loopEnv = Map("SPARK_GRAFT_LOOP_LONG" -> s"${d}x$b",
              "SPARK_GRAFT_CORPUS_TABLE" -> ClusterCorpusTable)
            // optional quiet-window launch probe (VERDICT r4 next #4): wait
            // for a clean bracket before each pair, bounded by the budget
            val waitQuiet =
              sys.env.get("SPARK_GRAFT_CLUSTER_WAIT_QUIET").map(_.toDouble)
            var ci = 0
            var cgo = true
            while (cgo && ci < clusterPairsN) {
              ci += 1
              var pre = ctlWindowEff()
              waitQuiet.foreach { thr =>
                var tries = 0
                while ((pre < thr || pre > ctlCleanHi) && tries < 10 &&
                    remainingSec > clusterLoopCost.sec * 1.2 + 60) {
                  System.err.println(f"[bench] cluster probe $pre%.3f outside [$thr%.2f,$ctlCleanHi%.2f] — waiting")
                  Thread.sleep(30000); tries += 1; pre = ctlWindowEff()
                }
              }
              System.err.println(s"[bench] cluster loop pair $ci (execs $execsLow vs $execsHigh)")
              clusterLoopCost.timed {
                phaseTry(s"cluster loop pair $ci") {
                  val (lo, hi) = clusterAbba(ci,
                    (n: Int) => spawnLooplong(8, clusterEnv(n) ++ loopEnv))
                  // settle: executor JVMs exit asynchronously — don't let
                  // their teardown squeeze the post-bracket
                  Thread.sleep(3000)
                  val post = ctlWindowEff()
                  System.err.println(f"[bench] cluster pair $ci ctl brackets $pre%.3f/$post%.3f")
                  state.clusterLoopPairs :+= LoopPair(lo, hi,
                    math.min(pre, post), math.max(pre, post))
                }
              }
              emit(state)
              cgo = ci < clusterPairsN &&
                gate(s"cluster loop pair ${ci + 1}", clusterLoopCost.sec)
            }
            dropCorpusLocation(ClusterCorpusTable) // tmpfs hygiene
          }
        }
      }
    }

    emit(state)
    System.err.println(f"[bench] done in ${elapsedSec}%.0f s (budget $budgetSec%.0f s)")
  }
}
