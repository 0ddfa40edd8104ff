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
