package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** "Fetch" = equi-join of the pop batch against the corpus table
  * (SURVEY §2.1 S2: join hit = HTTP 200 body, miss = fetch error).
  *
  * The pop batch is bounded by the politeness budget, so for typical batch
  * sizes Catalyst/AQE picks a broadcast hash join against the corpus scan —
  * embarrassingly parallel, zero shuffle of the 100 TB side. The broadcast
  * is deliberately NOT forced: building a broadcast relation is
  * driver-serial, so a multi-hundred-thousand-row politeness window must be
  * allowed to fall back to a shuffle join (AQE decides by size) or the
  * fetch stage stops scaling with executors. Status and content-type gates
  * mirror src/main.rs:179-186 (2xx + text/html only).
  */
object Fetcher {

  /** Rows of `documents` matched by the allowed pop batch, all statuses.
    * Columns: url, spans, status, content_type (+ popBatch's priority). */
  def fetch(allowedBatch: DataFrame, documents: DataFrame): DataFrame =
    documents.join(
      allowedBatch.select(col("url"), col("priority")),
      documents("doc_id") === col("url"), "inner")
      .drop("doc_id")

  /** The indexable subset: HTTP 2xx (F3) and Content-Type text/html (F2). */
  def okHtml(fetched: DataFrame): DataFrame =
    fetched.filter(
      col("status") >= 200 && col("status") < 300 &&
        col("content_type").startsWith("text/html"))
}
