package graft

import scala.collection.mutable

/** Sequential re-implementation of the crawl semantics (SURVEY §5.3).
  *
  * The reference's inter-thread pop order is racy; the deterministic
  * re-expression (SURVEY §7.4 risk 1) defines each superstep's pop set as:
  * per-host politeness cap of k, then per-BUCKET top-(B/nBuckets) by
  * (priority desc, url asc) — the batched form of the reference's
  * round-robin over its 64 pqueues (src/scheduler.rs:139-147), where
  * bucket = xxhash64(url) % nBuckets exactly as the engine routes
  * (src/main.rs:322-325 analog). This oracle executes that rule
  * sequentially over the same
  * deterministic corpus; the Spark engine must match it batch-for-batch
  * (set equality per batch) and on the exact final frontier/seen set
  * (north_rule: "matching the reference's crawl ordering and URL-seen set
  * under the same seed list + politeness budget").
  *
  * All admission/extraction logic is shared code (UrlOps, Parser, Robots) —
  * the oracle differs from the engine only in execution strategy.
  */
object ReferenceOracle {

  final case class Entry(host: String, var priority: Long, var popped: Boolean)
  final case class OracleResult(
      popBatches: Seq[Set[String]],
      frontier: Map[String, (String, Long, Boolean)], // url -> (host, priority, popped)
      metrics: Seq[BatchMetrics])

  def run(docs: Seq[Doc], robotsRules: Seq[RobotsEntry], seeds: Seq[Seed],
          cfg: CrawlConfig): OracleResult = {
    val docByUrl = docs.map(d => d.doc_id -> d).toMap
    val rules = robotsRules.map(r => r.host -> r.disallow).toMap
    val frontier = mutable.Map.empty[String, Entry]

    seeds.foreach { s =>
      val h = UrlOps.host(s.url).getOrElse("")
      frontier.get(s.url) match {
        case Some(e) => e.priority += s.weight
        case None => frontier(s.url) = Entry(h, s.weight, popped = false)
      }
    }

    val popBatches = Seq.newBuilder[Set[String]]
    val metricsOut = Seq.newBuilder[BatchMetrics]
    var batch = 0
    var doneLoop = false
    while (!doneLoop && batch < cfg.maxBatches) {
      // pop rule: per-host top-k by (priority desc, url asc), then per-bucket
      // top-(B/nBuckets) by the same order (identical to Frontier.popBatch)
      val candidates = frontier.iterator
        .filter(!_._2.popped)
        .map { case (url, e) => (url, e.host, e.priority) }
        .toSeq
      val perHost = candidates
        .groupBy(_._2)
        .values
        .flatMap(_.sortBy(c => (-c._3, c._1)).take(cfg.perHostCap))
        .toSeq
      val budget = Frontier.perBucketBudget(cfg)
      val pop = perHost
        .groupBy(c => Frontier.bucketOf(c._1, cfg.nBuckets))
        .values
        .flatMap(_.sortBy(c => (-c._3, c._1)).take(budget))
        .toSeq

      if (pop.isEmpty) doneLoop = true
      else {
        popBatches += pop.map(_._1).toSet
        pop.foreach { case (url, _, _) => frontier(url).popped = true }

        var fetched = 0L
        var robotsDenied = 0L
        var fetchErrors = 0L
        var megasites = 0L
        val linkIncs = mutable.ArrayBuffer.empty[(String, Long)]
        pop.foreach { case (url, _, _) =>
          if (!Robots.allowed(url, rules)) robotsDenied += 1
          else docByUrl.get(url) match {
            case None => fetchErrors += 1
            case Some(d) =>
              if (d.status >= 200 && d.status < 300 &&
                d.content_type.startsWith("text/html")) {
                fetched += 1
                // F9: megasite check runs on the UNCAPPED body size (the
                // reference inspects content_length before the capped read)
                if (Parser.htmlOf(d.spans).length.toLong > cfg.megasiteLen)
                  megasites += 1
                val html = Parser.cappedHtmlOf(d.spans, cfg.maxDocumentLen)
                linkIncs ++= Parser.extractLinks(url, html, cfg.maxUrlLen, cfg.crossDomainBonus)
              }
            // non-2xx / non-html: skipped (matched but not indexed/parsed)
          }
        }

        // insert-or-increment with duplicate/fresh metrics at distinct-url level
        val byUrl = linkIncs.groupBy(_._1).view.mapValues(_.map(_._2).sum)
        var dups = 0L
        var fresh = 0L
        byUrl.foreach { case (url, inc) =>
          frontier.get(url) match {
            case Some(e) => e.priority += inc; dups += 1
            case None =>
              fresh += 1
              frontier(url) = Entry(UrlOps.host(url).getOrElse(""), inc, popped = false)
          }
        }

        metricsOut += BatchMetrics(
          batch = batch, popped = pop.size.toLong, robotsDenied = robotsDenied,
          fetched = fetched, fetchErrors = fetchErrors,
          linksExtracted = linkIncs.size.toLong, linksAdmitted = linkIncs.size.toLong,
          duplicateHits = dups, freshUrls = fresh,
          frontierSize = frontier.size.toLong, megasites = megasites,
          elapsedMs = 0L)
        batch += 1
      }
    }
    OracleResult(
      popBatches.result(),
      frontier.map { case (u, e) => u -> ((e.host, e.priority, e.popped)) }.toMap,
      metricsOut.result())
  }
}
