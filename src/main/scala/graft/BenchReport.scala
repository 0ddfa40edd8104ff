package graft

/** Bench artifact state, rendering, and crash-robust emission — split out
  * of [[Bench]] so the harness file stays phases + knobs (VERDICT r4
  * next #7). Everything here serves one goal: the driver, which records
  * only the last ~2 KB of merged output, must always find ONE complete,
  * parseable compact JSON line there (see Bench's scaladoc for the
  * failure history and the defense list).
  */
private[graft] object BenchReport {

  /** One long-point rep at one level: per-superstep (urls, seconds),
    * superstep 0 (bootstrap) included — the parent drops it. */
  final case class LongRep(urls: Seq[Long], secs: Seq[Double])

  /** One interleaved (N, 4N) long-point pair plus its WINDOW SCORES: the
    * no-Spark string-control efficiency bracketing the pair — `ctl` the
    * lower, `ctlHi` the higher bracket. ~0.92+ = the box's own thread
    * scaling was clean; low = an external tenant squeezed pure-CPU work;
    * ABOVE ~1.05 = superlinear reading, i.e. the load hit the probe's own
    * N level — the direction that INFLATES ratios (BENCH.md §2.1). */
  final case class LoopPair(lo: LongRep, hi: LongRep,
      ctl: Double, ctlHi: Double)

  type KRes = (Double, Long, Double, Double) // (str, ku, kt, cpu)

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  // window-gate band (BENCH.md §2.1): clean = ctlClean <= bracket <=
  // ctlCleanHi; the band is TWO-SIDED — a superlinear bracket (> hi) means
  // the load squeezed the probe's own N level, the ratio-INFLATING
  // direction, and marks the window dirty just like a low one
  lazy val ctlClean =
    sys.env.getOrElse("SPARK_GRAFT_CTL_CLEAN", "0.88").toDouble
  lazy val ctlCleanHi =
    sys.env.getOrElse("SPARK_GRAFT_CTL_CLEAN_HI", "1.05").toDouble
  def pairClean(ctlLo: Double, ctlHi: Double): Boolean =
    ctlLo >= ctlClean && ctlHi <= ctlCleanHi
  /** The reported per-pair score is the DECISIVE bracket: the out-of-band
    * one when dirty (an excluded pair's number explains its exclusion),
    * the conservative min otherwise. */
  def ctlReport(ctlLo: Double, ctlHi: Double): Double =
    if (ctlHi > ctlCleanHi) ctlHi else ctlLo

  /** Everything measured so far; re-rendered into the cumulative compact
    * line after every phase unit. */
  final class State {
    var longPoint: Option[(Int, Int)] = None
    var loopPairs: Vector[LoopPair] = Vector.empty
    var kernelPairs: Vector[(KRes, KRes)] = Vector.empty
    var queries: Seq[(String, Double)] = Seq.empty
    var ann: Option[(Double, Double, Double, Double)] = None
    var sweepN: Seq[(Int, Int, Long, Double)] = Seq.empty
    var sweep4: Seq[(Int, Int, Long, Double)] = Seq.empty
    var clusterKernelPairs: Vector[((Long, Double), (Long, Double))] = Vector.empty
    var clusterLoopPairs: Vector[LoopPair] = Vector.empty
    var clusterPoint: Option[(Int, Int)] = None
  }

  @volatile private var latestCompact: String = ""

  /** Live children, killed by the shutdown hook so a parent SIGTERM doesn't
    * leave orphans streaming log noise into the driver's tail. */
  val liveChildren =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Process]()

  /** Render (compact, detail) JSON from whatever `s` holds. Fragment
    * presence tracks phase completion; the full-run line is schema-
    * identical to round 4's. Criteria land at the END of the line (the
    * driver keeps a bounded output tail). */
  private def render(s: State): (String, String) = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val pLow = sys.env.getOrElse("SPARK_GRAFT_P_LOW", "2").toInt
    val pHigh = pLow * 4
    val kf = sys.env.getOrElse("SPARK_GRAFT_KERNEL_FRONTIER", "4000000").toLong

    // kernel + in-child controls
    def best(side: Seq[KRes]): KRes =
      (side.map(_._1).min, side.head._2, side.map(_._3).min, side.map(_._4).min)
    val (kN, k4): (KRes, KRes) =
      if (s.kernelPairs.isEmpty) ((0.0, 0L, 0.0, 0.0), (0.0, 0L, 0.0, 0.0))
      else (best(s.kernelPairs.map(_._1)), best(s.kernelPairs.map(_._2)))
    val kthrN = if (kN._3 > 0) kN._2 / kN._3 else 0.0
    val kthr4 = if (k4._3 > 0) k4._2 / k4._3 else 0.0
    val kernelPairRatios = s.kernelPairs.map { case (lo, hi) => (lo._3 / hi._3) / 4.0 }
    val keffBest = if (kthrN > 0) (kthr4 / kthrN) / 4.0 else 0.0
    val keff = if (kernelPairRatios.nonEmpty) median(kernelPairRatios) else keffBest
    val cpuEff = if (k4._4 > 0) (kN._4 / k4._4) / 4.0 else 0.0
    val strEff = if (k4._1 > 0) (kN._1 / k4._1) / 4.0 else 0.0
    val kernelPairsStr = kernelPairRatios.zip(s.kernelPairs).map {
      case (r, (lo, hi)) =>
        f"""{"sec_pN":${lo._3}%.2f,"sec_p4N":${hi._3}%.2f,"ratio":$r%.3f}"""
    }.mkString("[", ",", "]")
    val kernelRatiosStr =
      kernelPairRatios.map(r => f"$r%.3f").mkString("[", ",", "]")
    val ctlDetail = if (s.kernelPairs.isEmpty) "" else
      f""""cpu_control":{"sec_pN":${kN._4}%.2f,"sec_p4N":${k4._4}%.2f,"efficiency":$cpuEff%.3f},"string_control":{"sec_pN":${kN._1}%.2f,"sec_p4N":${k4._1}%.2f,"efficiency":$strEff%.3f},"""
    val kernelDetail = if (s.kernelPairs.isEmpty) "" else
      f""""kernel_scaling":{"p_low":$pLow,"p_high":$pHigh,"frontier":$kf,"links":${kf * 2},"urls_pN":${kN._2},"sec_pN":${kN._3}%.2f,"thr_pN":$kthrN%.1f,"urls_p4N":${k4._2},"sec_p4N":${k4._3}%.2f,"thr_p4N":$kthr4%.1f,"pairs":$kernelPairsStr,"efficiency_best":$keffBest%.3f,"efficiency":$keff%.3f},"""
    val kernelCompact = if (s.kernelPairs.isEmpty) "" else
      f""""kernel_scaling":{"p_low":$pLow,"p_high":$pHigh,"urls":${k4._2},"sec_pN":${kN._3}%.2f,"sec_p4N":${k4._3}%.2f,"thr_pN":$kthrN%.1f,"thr_p4N":$kthr4%.1f,"pair_ratios":$kernelRatiosStr,"efficiency_best":$keffBest%.3f,"efficiency":$keff%.3f},"""

    // sweep
    val sweepJson = s.sweepN.zip(s.sweep4).map {
      case ((nb, nd, uN, tN), (_, _, u4, t4)) =>
        val thrN = uN / tN; val thr4 = u4 / t4
        (nb, nd, thrN, tN, thr4, t4, (thr4 / thrN) / 4.0)
    }
    val sweepStr = sweepJson.map { case (nb, nd, thrN, tN, thr4, t4, e) =>
      f"""{"batches":$nb,"n_docs":$nd,"batch_size":${nd / nb},"thr_pN":$thrN%.1f,"sec_pN":$tN%.2f,"thr_p4N":$thr4%.1f,"sec_p4N":$t4%.2f,"efficiency":$e%.3f}"""
    }.mkString("[", ",", "]")

    // long point (HEADLINE estimator rationale: BENCH.md §2.1 — median of
    // per-pair whole-run ratios over CLEAN-bracketed pairs; floor and
    // step-median ride alongside; < 2 clean pairs falls back to the
    // all-pair median rather than headlining a 1-sample "median")
    val longStr: Option[(Double, Double, String, String)] =
      (s.longPoint, s.loopPairs) match {
        case (Some((d, b)), ps) if ps.nonEmpty =>
          val urlsSteady = ps.head.lo.urls.drop(1).sum // deterministic per level
          val stepsN = ps.map(_.lo.secs.drop(1))
          val steps4 = ps.map(_.hi.secs.drop(1))
          val pairRows = ps.map { p =>
            val sN = p.lo.secs.drop(1).sum
            val s4 = p.hi.secs.drop(1).sum
            (sN, s4, (sN / s4) / 4.0, p.ctl, p.ctlHi)
          }
          val stepRatios = stepsN.zip(steps4).flatMap { case (sN, s4) =>
            sN.zip(s4).map { case (a, bb) => (a / bb) / 4.0 }
          }
          val floorN = stepsN.transpose.map(_.min).sum
          val floor4 = steps4.transpose.map(_.min).sum
          val thrNf = urlsSteady / floorN
          val thr4f = urlsSteady / floor4
          val effFloor = (thr4f / thrNf) / 4.0
          val effStepMedian = median(stepRatios)
          val effPairMedian = median(pairRows.map(_._3))
          val cleanRatios = pairRows.filter(p => pairClean(p._4, p._5)).map(_._3)
          val headline =
            if (cleanRatios.size >= 2) median(cleanRatios) else effPairMedian
          val pairsStr = pairRows.map { case (sN, s4, r, c, cHi) =>
            f"""{"sec_pN":$sN%.2f,"sec_p4N":$s4%.2f,"ratio":$r%.3f,"ctl":$c%.3f,"ctl_hi":$cHi%.3f}"""
          }.mkString("[", ",", "]")
          val ratiosStr = stepRatios.map(r => f"$r%.3f").mkString("[", ",", "]")
          val secNArr = pairRows.map(r => f"${r._1}%.1f").mkString("[", ",", "]")
          val sec4Arr = pairRows.map(r => f"${r._2}%.1f").mkString("[", ",", "]")
          val prArr = pairRows.map(r => f"${r._3}%.3f").mkString("[", ",", "]")
          val ctlArr = pairRows.map(r => f"${ctlReport(r._4, r._5)}%.3f")
            .mkString("[", ",", "]")
          val gateStr = f""""pair_ctls":$ctlArr,"ctl_clean":$ctlClean%.2f,"ctl_clean_hi":$ctlCleanHi%.2f,"clean_pairs":${cleanRatios.size},"efficiency_all_pairs":$effPairMedian%.3f,"""
          Some((thr4f, headline,
            f""""long":{"batches":$b,"n_docs":$d,"batch_size":${d / b},"urls_steady":$urlsSteady,"pairs":$pairsStr,"step_ratios":$ratiosStr,"ratio_min":${stepRatios.min}%.3f,"ratio_max":${stepRatios.max}%.3f,"thr_pN":$thrNf%.1f,"thr_p4N":$thr4f%.1f,$gateStr"efficiency_floor":$effFloor%.3f,"efficiency_step_median":$effStepMedian%.3f,"efficiency":$headline%.3f},""",
            f""""long":{"batches":$b,"n_docs":$d,"urls_steady":$urlsSteady,"sec_pN":$secNArr,"sec_p4N":$sec4Arr,"pair_ratios":$prArr,"ratio_min":${stepRatios.min}%.3f,"ratio_max":${stepRatios.max}%.3f,"thr_pN":$thrNf%.1f,"thr_p4N":$thr4f%.1f,$gateStr"efficiency_floor":$effFloor%.3f,"efficiency_step_median":$effStepMedian%.3f,"efficiency":$headline%.3f},"""))
        case _ => None
      }
    // headline loop efficiency: the long point when it ran, else the best
    // sweep point (small-corpus smoke runs)
    val (loopThr, loopEff) = longStr match {
      case Some((t, e, _, _)) => (t, e)
      case None =>
        val bst = sweepJson.sortBy(-_._7).headOption
        (bst.map(_._5).getOrElse(0.0), bst.map(_._7).getOrElse(0.0))
    }
    val longJson = longStr.map(_._3).getOrElse("")
    val longCompact = longStr.map(_._4).getOrElse("")

    // cluster scaling (same pair-median estimator as the thread criterion)
    val execsLow = sys.env.getOrElse("SPARK_GRAFT_CLUSTER_EXECS_LOW", "2").toInt
    val execsHigh = sys.env.getOrElse("SPARK_GRAFT_CLUSTER_EXECS_HIGH", "8").toInt
    val execCores = sys.env.getOrElse("SPARK_GRAFT_CLUSTER_EXEC_CORES", "1").toInt
    val (clusterJson, clusterCompact) =
      if (s.clusterLoopPairs.isEmpty && s.clusterKernelPairs.isEmpty) ("", "")
      else {
        val mem = sys.env.getOrElse("SPARK_GRAFT_CLUSTER_EXEC_MEM", "8192")
        val scale = execsHigh.toDouble / execsLow
        val kp = s.clusterKernelPairs.map { case ((_, tN), (_, t4)) =>
          (tN, t4, (tN / t4) / scale) }
        val kEff = if (kp.nonEmpty) median(kp.map(_._3)) else 0.0
        val kThr4 = s.clusterKernelPairs.headOption
          .map(p => p._1._1 / s.clusterKernelPairs.map(_._2._2).min).getOrElse(0.0)
        val kPairsStr = kp.map { case (a, b, r) =>
          f"""{"sec_e1":$a%.2f,"sec_e4":$b%.2f,"ratio":$r%.3f}""" }
          .mkString("[", ",", "]")
        val lp = s.clusterLoopPairs.map { p =>
          val sN = p.lo.secs.drop(1).sum; val s4 = p.hi.secs.drop(1).sum
          (sN, s4, (sN / s4) / scale, ctlReport(p.ctl, p.ctlHi)) }
        val urlsSteady = s.clusterLoopPairs.headOption
          .map(_.lo.urls.drop(1).sum).getOrElse(0L)
        val lEff = if (lp.nonEmpty) median(lp.map(_._3)) else 0.0
        val lThr4 = if (lp.nonEmpty) urlsSteady / lp.map(_._2).min else 0.0
        val lPairsStr = lp.map { case (a, b, r, c) =>
          f"""{"sec_e1":$a%.2f,"sec_e4":$b%.2f,"ratio":$r%.3f,"ctl":$c%.3f}""" }
          .mkString("[", ",", "]")
        val kRatios = kp.map(r => f"${r._3}%.3f").mkString("[", ",", "]")
        val lRatios = lp.map(r => f"${r._3}%.3f").mkString("[", ",", "]")
        val lCtls = lp.map(r => f"${r._4}%.2f").mkString("[", ",", "]")
        val lPoint = s.clusterPoint.map { case (d, b) => s"${d}x$b" }.getOrElse("")
        (f""""cluster_scaling":{"mode":"local-cluster","execs_low":$execsLow,"execs_high":$execsHigh,"exec_cores":$execCores,"exec_mem_mb":$mem,"kernel":{"pairs":$kPairsStr,"thr_e4":$kThr4%.1f,"efficiency":$kEff%.3f},"loop":{"point":"$lPoint","urls_steady":$urlsSteady,"pairs":$lPairsStr,"thr_e4":$lThr4%.1f,"efficiency":$lEff%.3f}},""",
         f""""cluster_scaling":{"execs":"${execsLow}x$execCores->${execsHigh}x$execCores","kernel_ratios":$kRatios,"kernel_eff":$kEff%.3f,"loop_ratios":$lRatios,"loop_ctls":$lCtls,"loop_thr_e4":$lThr4%.1f,"loop_eff":$lEff%.3f},""")
      }

    // queries: short keys ("q39") on the stdout line — full names outgrew
    // the driver's tail in r1–r3 (full map in the detail file)
    val qs = s.queries.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val qsShort = s.queries.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + f"\":$v%.2f" }.mkString("{", ",", "}")
    val total = s.queries.map(_._2).sum
    val annStr = s.ann
      .map { case (l, i, p, c) =>
        f""","ann_recall":{"lsh_q28":$l%.3f,"ivf_q42":$i%.3f,"pq_q53":$p%.3f,"ivfpq_q54":$c%.3f}""" }
      .getOrElse("")

    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "120000").toInt
    val detail =
      f"""{"metric":"frontier_throughput_urls_per_sec","value":$kthr4%.1f,"unit":"urls/sec","sf":"$sfDir","queries":$qs$annStr,$ctlDetail$kernelDetail"queries_total_sec":$total%.2f,$clusterJson"loop_scaling":{"p_low":$pLow,"p_high":$pHigh,"n_docs":$nDocs,"sweep":$sweepStr,$longJson"thr_p4N":$loopThr%.1f,"efficiency":$loopEff%.3f}}"""
    val sweepCompact =
      if (longStr.isDefined || sweepJson.isEmpty) "" else s""""sweep":$sweepStr,"""
    val compact =
      f"""{"metric":"frontier_throughput_urls_per_sec","value":$kthr4%.1f,"unit":"urls/sec","sf":"$sfDir","queries":$qsShort$annStr,$kernelCompact"queries_total_sec":$total%.2f,$clusterCompact"loop_scaling":{"p_low":$pLow,"p_high":$pHigh,$sweepCompact$longCompact"thr_p4N":$loopThr%.1f,"efficiency":$loopEff%.3f}}"""
    (compact, detail)
  }

  /** Re-render and print the cumulative compact line (stdout) and rewrite
    * the detail file — called after EVERY completed phase unit. */
  def emit(s: State): Unit = {
    val (compact, detail) = render(s)
    val detailPath =
      sys.env.getOrElse("SPARK_GRAFT_DETAIL_OUT", "target/bench_detail.json")
    try {
      val p = java.nio.file.Paths.get(detailPath)
      Option(p.getParent).foreach(d => java.nio.file.Files.createDirectories(d))
      java.nio.file.Files.write(p, (detail + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}")
    }
    if (compact.length > 1850)
      System.err.println(s"[bench] WARNING compact line ${compact.length} B" +
        " may outgrow the driver's output tail window")
    latestCompact = compact
    println(compact)
    System.out.flush()
  }

  /** Register the artifact-rescue hook with Hadoop's ShutdownHookManager
    * at priority 1: Spark's hooks run at priority 40 (higher = earlier),
    * so on a driver-side SIGTERM (timeout → rc 124) ours runs LAST — it
    * kills live children (stops their log streams) and re-prints the
    * latest compact line as the tail's final content. */
  def installShutdownHook(): Unit =
    try org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
      new Runnable {
        def run(): Unit = {
          liveChildren.forEach(p => p.destroy())
          if (latestCompact.nonEmpty) { println(latestCompact); System.out.flush() }
        }
      }, 1)
    catch { case e: Throwable =>
      System.err.println(s"[bench] shutdown hook failed: ${e.getMessage}")
    }
}
