package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.multimodal.MultimodalOps
import graft.streaming.StreamingOps

/** Multimodal-column and streaming query surface.
  *
  * Multimodal feature extraction runs through `mapPartitions` with a
  * stubbed decode kernel (codecs absent in this container — see
  * MultimodalOps) → rows-only driver check + MultimodalSpec.
  * The streaming resample produces the same result as the batch resample
  * by construction (complete mode over a finite source), so it carries the
  * batch DuckDB oracle.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload -> batched decode (stub) -> typed features.
    "q_multimodal_features" -> ((s, dir) =>
      MultimodalOps.extractFeatures(
          MultimodalOps.withSyntheticPayload(
            Tables.documents(s, dir), "doc_id", "text"), "doc_id")
        .withColumn("meanByte", round(col("meanByte"), 6))
        .withColumn("byteEntropy", round(col("byteEntropy"), 6))
        .orderBy("id")),

    // Frame sampling: pure-expression payload slicing (every 2nd 512B frame).
    "q_frame_sample" -> ((s, dir) =>
      MultimodalOps.sampleFrames(
          MultimodalOps.withSyntheticPayload(
            Tables.documents(s, dir), "doc_id", "text"),
          "doc_id", frameSize = 512, stride = 2)
        .select(col("doc_id"), col("frame_idx"),
          length(col("frame_bytes")).as("frame_len"))
        .orderBy("doc_id", "frame_idx")),

    // Structured Streaming A1: same windows, same oracle as the batch path.
    "q_stream_resample" -> ((s, dir) => {
      val r = StreamingOps.runResampleOnce(s, dir, "1 hour")
      r.withColumn("mean_value", round(col("mean_value"), 6))
        .orderBy("bucket_start")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // q_multimodal_features: rows-only (decode stub; blob byte math is not
    // reasonably expressible in DuckDB SQL) — MultimodalSpec pins values.
    "q_frame_sample" ->
      """WITH p AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n,
        |         CAST(ceil(octet_length(encode(text)) / 512.0) AS INT) AS n_frames
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, unnest(range(0, n_frames)) AS frame_idx, n FROM p)
        |SELECT doc_id, frame_idx,
        |       least(512, n - frame_idx * 512) AS frame_len
        |FROM f WHERE frame_idx % 2 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "q_stream_resample" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
        |       round(avg(value), 6) AS mean_value, count(value) AS point_count
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
