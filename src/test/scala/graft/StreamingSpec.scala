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
