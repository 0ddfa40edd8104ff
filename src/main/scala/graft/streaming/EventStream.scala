package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface for the `events` stream table.
  *
  * The reference crawler has no event-time streaming (SURVEY §2.9 — its
  * feedback loop is re-expressed as BSP supersteps), but a training-data
  * platform ingests event streams; these operators are the Spark-native
  * shapes for that: watermarked tumbling-window aggregation and custom
  * sessionization state via mapGroupsWithState. Each transform is
  * source-agnostic — the same code runs on a static DataFrame (batch
  * backfill) or a readStream (live), which is exactly how Structured
  * Streaming is meant to be used.
  */
object EventStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  private final case class SessionState(lastSec: Long, sessions: Long, events: Long)

  /** Watermarked tumbling-window counts per event type. On a stream this
    * emits finalized windows (late data beyond the watermark dropped); on a
    * static frame the watermark is a no-op and it is the batch equivalent. */
  def windowedCounts(events: DataFrame,
                     watermark: String = "1 hour",
                     windowLen: String = "1 hour"): DataFrame =
    events
      // parquet timestamps infer as NTZ in Spark 4; watermarks need LTZ —
      // the cast reads NTZ wall time in the session zone (pinned to UTC)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 1000) AS BIGINT)")).as("sum_milli"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_milli"))

  /** Per-user session counting with a 30-minute inactivity gap, as
    * mapGroupsWithState — the KeyValueGroupedDataset custom-state path.
    * Incremental and restart-safe on a stream (state checkpointed by the
    * engine); deterministic on a static frame. */
  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapSeconds: Long = 1800L): Dataset[UserSessions] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val prior = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          var st = prior
          it.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val sec = e.ts.getTime / 1000L
            val newSession = st.lastSec == Long.MinValue || sec - st.lastSec > gapSeconds
            st = SessionState(sec,
              st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          UserSessions(uid, st.sessions, st.events)
      }
  }

  /** Streaming query runner: parquet-dir source → windowed counts →
    * in-memory sink (for tests/demos; swap the sink for production). */
  def runWindowedStream(spark: SparkSession, srcDir: String, queryName: String): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    // Complete mode: a bounded source never advances the watermark past the
    // final windows, so Append would withhold them — Complete emits every
    // window and makes batch-vs-stream parity exact (tested in StreamingSpec)
    windowedCounts(stream)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName(queryName)
      .start()
      .processAllAvailable()
  }
}
