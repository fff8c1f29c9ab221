package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming embodiment of the resample family (SURVEY §2.10:
  * the reference is batch-only, but its tumbling-bucket shapes ARE what
  * `window()` over a stream produces — this module is the ingest extension).
  *
  * `runResampleOnce` drives the events table through a real streaming query
  * (parquet source → event-time window aggregate → sink) synchronously and
  * returns the result, so the SAME DuckDB oracle that checks the batch
  * resample checks the streaming path. Complete output mode is used for the
  * oracle run (emits every window); the watermarked append-mode variant is
  * exercised in StreamingSpec.
  */
object StreamingOps {

  private val runId = new AtomicInteger(0)

  /** Events schema as stored (ts is TIMESTAMP(NANOS) → read as raw nanos,
    * same as Tables.events). */
  private val EventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming source over the events parquet. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the streaming parquet source wants a directory; glob-filter to the
    // events table within the multi-table sf dir
    spark.readStream.schema(EventsSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Event-time tumbling-window mean over a stream (A1 as a stream). */
  def windowedMean(stream: DataFrame, duration: String,
      watermark: Option[String] = None): DataFrame = {
    val wm = watermark.fold(stream)(stream.withWatermark("ts", _))
    // group on the window STRUCT (extracting .start here would hide the
    // event-time column from the watermark tracker); project start after
    wm.groupBy(window(col("ts"), duration).as("w"))
      .agg(avg("value").as("mean_value"), count("value").as("point_count"))
      .select(col("w.start").as("bucket_start"), col("mean_value"), col("point_count"))
  }

  /** Run the streaming resample to completion over the (finite) events
    * table and return the full result. Complete mode + memory sink: every
    * window is emitted, so the result equals the batch aggregation and the
    * batch oracle applies. */
  def runResampleOnce(spark: SparkSession, dir: String, duration: String): DataFrame = {
    val name = s"graft_stream_resample_${runId.incrementAndGet()}"
    val q = windowedMean(eventsStream(spark, dir), duration)
      .writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    spark.table(name)
  }
}
