package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming resample (complete mode) equals the batch aggregation") {
    val streamed = StreamingOps.runResampleOnce(spark, TestSpark.Sf0001, "1 hour")
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1.getTime).toSeq
    val batch = graft.ops.ResampleOps.resampleMean(
        graft.tables.Tables.events(spark, TestSpark.Sf0001), "ts", "value", "1h")
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1.getTime).toSeq
    assert(streamed == batch)
  }

  test("streaming dedup state carries across micro-batches") {
    import spark.implicits._
    // two files → maxFilesPerTrigger=1 forces two micro-batches; a dup in
    // batch 2 of content first seen in batch 1 must be suppressed by the
    // cross-batch state store, not just within-batch
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_dedup").toString
    Seq((1L, "alpha", "en", "s", 5L), (2L, "beta", "en", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/f1")
    Seq((3L, "alpha", "en", "s", 5L), (4L, "gamma", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/f2")
    val q = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
      .select(md5(col("text").cast("binary")).as("content_hash"))
      .dropDuplicates("content_hash")
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_stream_dedup_xbatch").start()
    try q.processAllAvailable() finally q.stop()
    // 4 docs, 3 distinct contents → exactly 3 emissions across batches
    assert(spark.table("graft_stream_dedup_xbatch").count() == 3)
  }

  test("flatMapGroupsWithState user stats equal the batch aggregate") {
    val streamed = StreamingOps.runUserStatsOnce(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val batch = graft.tables.Tables.events(spark, TestSpark.Sf0001)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(streamed == batch)
  }

  test("watermarked append-mode stream runs and emits finalized windows") {
    val stream = StreamingOps.windowedMean(
      StreamingOps.eventsStream(spark, TestSpark.Sf0001), "1 hour",
      watermark = Some("2 hours"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("graft_stream_wm_test").start()
    try q.processAllAvailable() finally q.stop()
    val n = spark.table("graft_stream_wm_test").count()
    // every non-empty window older than max(event_time) - 2h watermark is
    // finalized and emitted; only the trailing ≤3 buckets may be withheld
    val batchBuckets = graft.ops.ResampleOps.resampleMean(
      graft.tables.Tables.events(spark, TestSpark.Sf0001), "ts", "value", "1h").count()
    assert(n >= batchBuckets - 3 && n <= batchBuckets)
  }
}
