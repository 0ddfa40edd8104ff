package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract operators.
  *
  * The Spark-side shape is the real thing — schema, batch iteration,
  * partition-preserving narrow transforms; the codec itself is a STUB
  * (deterministic fake, clearly marked) because no media libraries exist in
  * this container. Swapping [[StubCodec]] for a real JNI/FFmpeg codec changes
  * no plan shape: decode stays a narrow per-partition map with no shuffle.
  */
object MultiModal {

  /** A media asset row: payload + typed metadata (the pattern for 100 TB
    * media lakes: metadata columns are tiny and prunable, the blob column is
    * only read by stages that decode). */
  final case class MediaAsset(
      doc_id: Long,
      kind: String,          // image | audio | video
      payload: Array[Byte],  // opaque encoded bytes
      n_bytes: Long,
      codec: String)

  final case class MediaFeatures(
      doc_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      mean_luma_micro: Long) // deterministic stand-in for a pixel statistic

  // -------------------------------------------------------------------
  // STUB CODEC — deterministic fake. A real build replaces this object.
  // -------------------------------------------------------------------
  object StubCodec {
    /** STUB: "decode" dimensions/frames/luma purely from the byte stream,
      * deterministically. Real impl would call an image/audio decoder. */
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Long) = {
      val n = payload.length
      var acc = 1125899906842597L
      var i = 0
      while (i < n) { acc = acc * 31 + (payload(i) & 0xff); i += 1 }
      val h = acc & 0x7fffffffffffffffL
      val width = 16 + (h % 1024).toInt
      val height = 16 + ((h >> 10) % 1024).toInt
      val frames = kind match {
        case "video" => 1 + ((h >> 20) % 300).toInt
        case "audio" => 1 + ((h >> 20) % 48000).toInt
        case _       => 1
      }
      val luma = (h >> 32) % 1000000L
      (width, height, frames, luma)
    }
  }

  /** Build a media-asset table from a text corpus (payload = UTF-8 bytes —
    * the deterministic fake blob; at ingest time this column would hold real
    * encoded media). Pure Catalyst. */
  def assetsFromText(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("codec",
        element_at(array(lit("png"), lit("flac"), lit("h264")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")))

  /** Decode + feature-extract: a NARROW per-partition pass (mapPartitions
    * over the typed Dataset — the Scala analog of a pandas-UDF batch decode).
    * No shuffle; the blob column never moves between executors. */
  def extractFeatures(spark: SparkSession, assets: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    assets.as[MediaAsset].mapPartitions { it =>
      it.map { a =>
        val (w, h, f, luma) = StubCodec.decode(a.kind, a.payload)
        MediaFeatures(a.doc_id, a.kind, w, h, f, luma)
      }
    }
  }

  /** Metadata-only projection — must prune the blob column at the scan
    * (verified in tests via the optimized plan's output schema). */
  def metaOnly(assets: DataFrame): DataFrame =
    assets.select(col("doc_id"), col("kind"), col("n_bytes"), col("codec"))

  /** Resize plan: fit each asset's (width, height) into a target box
    * preserving aspect ratio — integer math, pure Catalyst (the actual
    * pixel resample would happen in the same batch decode pass as
    * [[extractFeatures]]; this computes the target geometry the way a
    * preprocessing pipeline plans it). */
  def resizeToFit(features: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    // scale = min(maxW/w, maxH/h, 1) in exact rational arithmetic:
    // out_w = floor(w * num / den) with (num, den) the tighter bound
    val w = col("width").cast("long")
    val h = col("height").cast("long")
    val useWidthBound = w * maxH >= h * maxW // width is the tighter constraint
    features.select(
      col("doc_id"), col("kind"), col("width"), col("height"),
      when(w <= maxW && h <= maxH, w)
        .when(useWidthBound, lit(maxW.toLong))
        .otherwise(w * maxH / h).cast("int").as("out_w"),
      when(w <= maxW && h <= maxH, h)
        .when(useWidthBound, h * maxW / w)
        .otherwise(lit(maxH.toLong)).cast("int").as("out_h"))
  }

  /** Frame-sampling plan shape for video: explode a frame index sequence
    * bounded by n_frames, keeping the payload reference — the downstream
    * decode touches only sampled frames. Pure Catalyst. */
  def sampleFrames(features: DataFrame, everyN: Int): DataFrame =
    features.filter(col("kind") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(everyN)))
          .as("frame_idx"))
}
