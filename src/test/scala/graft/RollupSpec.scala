package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RollupOps
import graft.tables.Tables

/** Incremental rollup maintenance (RollupOps.maintainByKey): maintained ≡
  * full recompute, late data reprocesses its old partition, the recompute
  * scan is partition-pruned to the changed keys, and an empty batch is the
  * identity. */
class RollupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dailyAgg(d: DataFrame): DataFrame = d.groupBy("day").agg(
    count(lit(1)).as("n"),
    countDistinct(col("user_id")).as("n_users"),
    sum(round(col("value") * 1e6, 0).cast("long")).as("sum_micro"))

  private lazy val env = {
    val root = new java.io.File("target/fixtures/rollup").getAbsolutePath
    val ev = Tables.events(spark, TestSpark.Sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .withColumn("day", to_date(col("ts")))
    val isLate = col("day") === lit("2024-01-10").cast("date") &&
      col("event_id") % 7 === 0
    val isBatch = col("day") >= lit("2024-01-26").cast("date") || isLate
    ev.filter(!isBatch).write.mode("overwrite")
      .partitionBy("day").parquet(s"$root/base")
    val base = spark.read.parquet(s"$root/base")
    val batch = ev.filter(isBatch)
    (ev, base, batch)
  }

  test("maintained ≡ full recompute, including the late-data day") {
    val (ev, base, batch) = env
    val v1 = dailyAgg(base)
    val maintained = RollupOps.maintainByKey(
        v1, base.unionByName(batch), batch, "day", dailyAgg)
      .orderBy("day").collect().toSeq
    val full = dailyAgg(ev).orderBy("day").collect().toSeq
    assert(maintained == full)
    // the late day actually changed between v1 and v2 (otherwise this
    // test wouldn't be exercising the backfill path)
    val lateDay = java.sql.Date.valueOf("2024-01-10")
    val v1Late = v1.filter(col("day") === lateDay).head()
    val v2Late = maintained.find(_.getDate(0) == lateDay).get
    assert(v1Late.getLong(1) < v2Late.getLong(1))
  }

  test("recompute scan is partition-pruned to exactly the changed days") {
    val (_, base, batch) = env
    val changed = batch.select(col("day")).distinct().collect()
      .map(_.getDate(0)).toSeq
    val prunedScan = base.filter(col("day").isInCollection(changed))
    // the changed-day IN list must plan as a PARTITION filter (static
    // pruning — `inputFiles` can't show this; the executed scan's
    // numFiles metric can)
    val plan = prunedScan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("day")), plan.take(2000))
    prunedScan.collect()
    val scan = prunedScan.queryExecution.executedPlan.collectLeaves()
      .find(_.metrics.contains("numFiles")).get
    val read = scan.metrics("numFiles").value
    // base holds no files for the five NEW days; of the changed set only
    // the late day exists in base → exactly that day's files get read,
    // out of 25 day partitions
    val lateDayFiles = base.inputFiles.count(_.contains("day=2024-01-10"))
    assert(read == lateDayFiles && read < base.inputFiles.length,
      s"read $read files, late-day has $lateDayFiles of ${base.inputFiles.length}")
  }

  test("empty batch is the identity (no recompute, prev returned as-is)") {
    val (_, base, batch) = env
    val v1 = dailyAgg(base)
    val out = RollupOps.maintainByKey(
      v1, base, batch.filter(lit(false)), "day", dailyAgg)
    assert(out eq v1)
  }

  test("continuous rollup at ingest ≡ one batch aggregate over the stream") {
    val streamed = graft.streaming.StreamingOps
      .runStreamRollupOnce(spark, TestSpark.Sf0001, dailyAgg)
      .orderBy("day").collect().toSeq
    val batch = dailyAgg(
        Tables.events(spark, TestSpark.Sf0001)
          .select(col("event_id"), col("ts"), col("user_id"), col("value"))
          .withColumn("day", to_date(col("ts"))))
      .orderBy("day").collect().toSeq
    assert(streamed == batch && batch.size >= 25)
  }

  test("rollup versions: one per batch; mid-stream replay is exactly-once") {
    import graft.streaming.StreamingOps
    val tmp = java.nio.file.Files.createTempDirectory("graft_rollup_replay").toString
    val arch = s"$tmp/arch"
    val sid = StreamingOps.streamScope(s"$tmp/ckpt")
    val ev = Tables.events(spark, TestSpark.Sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    // four deterministic ts-range batches driven by hand (the engine path
    // is covered above; hand-driving exposes batch ids for the replay)
    val cuts = Seq("2024-01-08", "2024-01-16", "2024-01-24")
      .map(d => lit(d).cast("timestamp"))
    val batches = Seq(
      ev.filter(col("ts") < cuts(0)),
      ev.filter(col("ts") >= cuts(0) && col("ts") < cuts(1)),
      ev.filter(col("ts") >= cuts(1) && col("ts") < cuts(2)),
      ev.filter(col("ts") >= cuts(2)))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingOps.maintainRollupBatch(b, i.toLong, sid, "ts", arch, dailyAgg)
    }
    // one version per batch, and the latest equals the full aggregate
    val vPaths = (0 until 4).map(i =>
      StreamingOps.rollupVersionPath(arch, sid, i.toLong))
    vPaths.foreach(p => assert(new java.io.File(p).isDirectory, p))
    def read(p: String) = spark.read.parquet(p).orderBy("day").collect().toSeq
    val before = vPaths.map(read)
    assert(before.last == dailyAgg(ev.withColumn("day", to_date(col("ts"))))
      .orderBy("day").collect().toSeq)
    // redeliver batch 2 (at-least-once): the idempotent archive append
    // absorbs the rows, version 2 rewrites identically, later versions
    // untouched — exactly-once OUTPUT
    StreamingOps.maintainRollupBatch(batches(2), 2L, sid, "ts", arch, dailyAgg)
    assert(vPaths.map(read) == before)

    // time travel: the rollup as of batch 2 = version 2's snapshot
    val asOf = StreamingOps.latestRollup(spark, arch, beforeId = Some(3L))
      .get.orderBy("day").collect().toSeq
    assert(asOf == before(2))

    // VACUUM keep-2: v0/v1 deleted, v2/v3 intact, latest read unaffected
    // (versions are self-contained snapshots, not deltas)
    assert(StreamingOps.vacuumRollups(spark, arch, keepLast = 2) == 2)
    assert(!new java.io.File(vPaths(0)).exists())
    assert(!new java.io.File(vPaths(1)).exists())
    assert(read(vPaths(2)) == before(2) && read(vPaths(3)) == before(3))
    assert(StreamingOps.latestRollup(spark, arch).get
      .orderBy("day").collect().toSeq == before(3))
  }

  test("empty first batch against an empty archive is a no-op, not a crash") {
    // regression: refreshFooterIndex ran spark.read.parquet on an archive
    // holding only sidecar dirs and died on schema inference — the first
    // delivery of a fresh ingest loop is exactly this shape
    import graft.streaming.StreamingOps
    val tmp = java.nio.file.Files.createTempDirectory("graft_rollup_empty").toString
    val arch = s"$tmp/arch"
    val sid = StreamingOps.streamScope(s"$tmp/ckpt")
    val ev = Tables.events(spark, TestSpark.Sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    StreamingOps.maintainRollupBatch(
      ev.filter(lit(false)), 0L, sid, "ts", arch, dailyAgg)
    assert(!new java.io.File(
      StreamingOps.rollupVersionPath(arch, sid, 0L)).exists())
    // and the loop proceeds normally afterwards
    StreamingOps.maintainRollupBatch(ev, 1L, sid, "ts", arch, dailyAgg)
    val v1 = spark.read.parquet(StreamingOps.rollupVersionPath(arch, sid, 1L))
      .orderBy("day").collect().toSeq
    assert(v1 == dailyAgg(ev.withColumn("day", to_date(col("ts"))))
      .orderBy("day").collect().toSeq)
  }

  test("null-timestamp rows maintain the NULL-day group (zones can't " +
       "name it; n_nulls routes it)") {
    import graft.streaming.StreamingOps
    val tmp = java.nio.file.Files.createTempDirectory("graft_rollup_null").toString
    val arch = s"$tmp/arch"
    val sid = StreamingOps.streamScope(s"$tmp/ckpt")
    val ev = Tables.events(spark, TestSpark.Sf0001)
      .select(col("event_id"),
        when(col("event_id") % 97 === 0, lit(null)).otherwise(col("ts")).as("ts"),
        col("user_id"), col("value"))
    val cut = lit("2024-01-16").cast("timestamp")
    // batch 0: no nulls; batches 1-2: null-ts rows interleaved — the
    // null group must grow across batches exactly like a day group
    val batches = Seq(
      ev.filter(col("ts") < cut),
      ev.filter(col("ts").isNull && col("event_id") < 500),
      ev.filter(col("ts") >= cut ||
        (col("ts").isNull && col("event_id") >= 500)))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingOps.maintainRollupBatch(b, i.toLong, sid, "ts", arch, dailyAgg)
    }
    val latest = StreamingOps.latestRollup(spark, arch).get
      .orderBy(col("day").asc_nulls_first).collect().toSeq
    val full = dailyAgg(ev.withColumn("day", to_date(col("ts"))))
      .orderBy(col("day").asc_nulls_first).collect().toSeq
    assert(latest == full)
    // and the null group is genuinely present (the test would otherwise
    // pass vacuously on data without nulls)
    assert(full.exists(_.isNullAt(0)))
    assert(full.find(_.isNullAt(0)).get.getLong(1) >= 10)
    // both null-bearing batches contributed (the cross-batch growth path)
    assert(batches(1).count() > 0 && batches(2).filter(col("ts").isNull).count() > 0)
  }

  test("dim-delta IVM: exact vs full recompute, and the delta key routes " +
       "to a strict file subset") {
    import graft.sources.SkipIndex
    import graft.ops.RollupOps
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivm").toString
    val root = s"$tmp/facts"
    // three day-clustered files; user 3 has facts ONLY on 2024-01-02
    import spark.implicits._
    val facts0 = Seq(
      (1L, "2024-01-01 01:00:00", 1L, 10.0), (2L, "2024-01-01 02:00:00", 2L, 20.0),
      (3L, "2024-01-02 01:00:00", 3L, 30.0), (4L, "2024-01-02 02:00:00", 4L, 40.0),
      (5L, "2024-01-03 01:00:00", 1L, 50.0), (6L, "2024-01-03 02:00:00", 4L, 60.0)
    ).toDF("event_id", "ts_s", "user_id", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    SkipIndex.writeTimeClustered(facts0, "ts", root, numFiles = 8)
    val idx = SkipIndex.buildFooterIndex(spark, root, "ts")
    val bloom = SkipIndex.buildBloomIndex(
      spark, root, "CAST(user_id AS STRING)", 100L, 1L << 16)
    // the delta key's facts live on one day → strictly fewer files route
    // than exist (zones are per-day by construction)
    val routed = SkipIndex.pruneFilesByKeys(bloom, Seq("3")).collect()
    val allFiles = spark.read.parquet(root).inputFiles.length
    assert(routed.nonEmpty && routed.length < allFiles,
      s"routed ${routed.length} of $allFiles")

    def segV(updated: Boolean)(d: org.apache.spark.sql.DataFrame) = {
      val seg = if (updated) when(col("user_id") === 3L, lit(99L))
        .otherwise(col("user_id") % 2) else col("user_id") % 2
      d.withColumn("segment", seg).groupBy("day", "segment")
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 1e6, 0).cast("long")).as("sum_micro"))
    }
    val facts = spark.read.parquet(root).withColumn("day", to_date(col("ts")))
    val v1 = segV(updated = false)(facts)
    val maintained = RollupOps.maintainOnDimDelta(
        v1, idx, bloom, "user_id", Seq("3"), "ts", segV(updated = true))
      .orderBy("day", "segment").collect().toSeq
    val full = segV(updated = true)(facts)
      .orderBy("day", "segment").collect().toSeq
    assert(maintained == full)
    // the update genuinely changed the routed day's grouping
    assert(full.exists(_.getLong(1) == 99L))

    // a key with NO facts routes nowhere → prev returned untouched
    val unchanged = RollupOps.maintainOnDimDelta(
      v1, idx, bloom, "user_id", Seq("does-not-exist"), "ts", segV(updated = true))
    assert(unchanged.orderBy("day", "segment").collect().toSeq ==
      v1.orderBy("day", "segment").collect().toSeq)
  }

  test("CDC sink: content-to-batch permutation and batch replay both converge") {
    import graft.streaming.StreamingOps
    import graft.ops.MergeOps
    import spark.implicits._
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("id", "v").withColumn("__seq", lit(0L))
      .withColumn("__deleted", lit(false))
    val groups = Seq( // seq-ordered change groups, same shape as the query
      Seq(("U", 1L, 1L, 11.0), ("I", 9L, 1L, 90.0)),
      Seq(("U", 1L, 2L, 12.0), ("U", 2L, 2L, 22.0)),
      Seq(("D", 2L, 3L, 0.0)))
      .map(_.toDF("op", "id", "seq", "v"))
    val expected = Seq((1L, 12.0), (3L, 30.0), (9L, 90.0))
    def drive(contentOrder: Seq[Int], tag: String): Seq[(Long, Double)] = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_cdc_$tag").toString
      contentOrder.zipWithIndex.foreach { case (g, batchId) =>
        StreamingOps.maintainCdcBatch(base, groups(g), batchId.toLong,
          "t", dir, "id", "op", "seq")
      }
      StreamingOps.latestRollup(spark, dir).get
        .filter(!col("__deleted")).select("id", "v").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    }
    // in-order content
    assert(drive(Seq(0, 1, 2), "inorder") == expected)
    // the delete's group arrives FIRST, the stale updates after — the
    // seq guard must refuse to resurrect key 2 or regress key 1
    assert(drive(Seq(2, 0, 1), "permuted") == expected)
    // replay convergence: re-running the last batch against its
    // unchanged predecessor rewrites the same snapshot
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_replay").toString
    Seq(0, 1, 2).zipWithIndex.foreach { case (g, i) =>
      StreamingOps.maintainCdcBatch(base, groups(g), i.toLong,
        "t", dir, "id", "op", "seq")
    }
    val last = StreamingOps.latestRollup(spark, dir).get.collect().toSet
    StreamingOps.maintainCdcBatch(base, groups(2), 2L, "t", dir, "id", "op", "seq")
    assert(StreamingOps.latestRollup(spark, dir).get.collect().toSet == last)
    // equal seqs for one key fail fast, never a silent coin flip
    val dup = Seq(("U", 1L, 5L, 1.0), ("D", 1L, 5L, 0.0))
      .toDF("op", "id", "seq", "v")
    val e = intercept[IllegalArgumentException] {
      MergeOps.applyCdcVersioned(base, dup, "id", "op", "seq")
    }
    assert(e.getMessage.contains("nondeterministic"))
  }
}
