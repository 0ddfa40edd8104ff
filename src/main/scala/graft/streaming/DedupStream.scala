package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication for a document stream — the incremental
  * form of [[graft.ops.Dedup.exactDupMarks]]: the first document carrying a
  * given content hash is emitted, every later arrival is dropped, with the
  * seen-set held as keyed engine state (checkpointed and restart-safe on a
  * stream, deterministic on a static frame).
  *
  * Contract: per micro-batch, emit the min-doc_id row of each content hash
  * never seen in ANY earlier micro-batch. On a single static batch this is
  * exactly "the exactDupMarks keepers" (min id per hash), which gives the
  * operator a DuckDB oracle (q43) and an exact batch-vs-stream parity test.
  *
  * Spark's built-in `dropDuplicates` on a stream keeps an arbitrary first
  * row per key; the explicit flatMapGroupsWithState form pins the
  * deterministic min-id choice so results are reproducible across engines
  * and across replays.
  */
object DedupStream {

  final case class DocHash(doc_id: Long, content_hash: String)

  def firstSeen(spark: SparkSession, docs: Dataset[DocHash]): Dataset[DocHash] = {
    import spark.implicits._
    docs
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[DocHash], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator(it.minBy(_.doc_id))
          }
      }
  }
}
