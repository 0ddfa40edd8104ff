package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

/** Structured Streaming parity: the same transform over readStream must
  * produce exactly the batch result on the same bounded input, and the
  * mapGroupsWithState sessionizer must agree with the window/lag batch
  * formulation (q32). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val eventsPath = "/root/testdata/sf0.001/events.parquet"

  test("windowed counts: streaming over the parquet source == batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(eventsPath),
      java.nio.file.Paths.get(s"$tmp/events.parquet"))

    EventStream.runWindowedStream(spark, tmp, "winstream")
    val streamed = spark.table("winstream")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    val batch = EventStream.windowedCounts(spark.read.parquet(eventsPath))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming first-seen dedup: chunked stream == batch == min-id keepers") {
    import graft.streaming.DedupStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sc = spark.sqlContext

    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .as[DedupStream.DocHash].collect().sortBy(_.doc_id)
    // the driver corpus has no exact dups — append re-ingested copies so
    // the cross-micro-batch state path actually drops rows
    val docs = (base ++ base.take(60).map(d => d.copy(doc_id = d.doc_id + 100000)))
      .sortBy(_.doc_id)

    // batch form (q43's code path)
    val batch = DedupStream.firstSeen(spark,
      docs.toSeq.toDS()).collect().map(d => d.content_hash -> d.doc_id).toMap

    // streamed in 3 chunks: state must carry across micro-batches
    val mem = MemoryStream[DedupStream.DocHash]
    val q = DedupStream.firstSeen(spark, mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedupstream").start()
    docs.grouped(math.max(docs.length / 3, 1)).foreach { chunk =>
      mem.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("dedupstream")
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap

    assert(streamed == batch)
    // and both equal the exact-dedup keepers (min doc_id per hash)
    val keepers = docs.groupBy(_.content_hash).map { case (h, xs) =>
      h -> xs.map(_.doc_id).min
    }
    assert(batch == keepers)
    assert(batch.size < docs.length, "fixture should contain duplicates")
  }

  test("mapGroupsWithState sessionization == lag-based batch formulation") {
    val events = spark.read.parquet(eventsPath)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    val stateful = EventStream.sessionize(spark, events)
      .collect().map(s => s.user_id -> ((s.n_sessions, s.n_events))).toMap

    val lagBased = SparkEntry.queries("q32_sessionize")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    assert(stateful == lagBased)
    assert(stateful.nonEmpty)
  }
}
