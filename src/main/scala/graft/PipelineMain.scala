package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline as a user would run it:
  * documents → exact dedup → near-dup cluster drop → quality/lang gates →
  * sequence packing → sharded export. Composes the same operators the
  * contract queries exercise one by one (`q_corpus_clean`,
  * `q_pack_sequences`, [[graft.sources.TrainingExport]]); this main exists
  * so the whole flow can be launched as one job:
  *
  *   sbt "runMain graft.PipelineMain <sfDir> <outDir> [nShards] [capacity]"
  *
  * One cache point (the cleaned corpus feeds both the pack stage and the
  * export), one export shuffle; every stage is the scale-audited shape. */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_pipeline_out"
    val nShards = if (args.length > 2) args(2).toInt else 8
    val capacity = if (args.length > 3) args(3).toInt else 2048
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      // report sorted output for one-file-per-bucket bucketed scans
      // (Spark's single-file check still guards multi-file buckets) —
      // elides the index-side merge-join sort for the persisted
      // band/IVF/bucketed-fact tables
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = run(spark, sfDir, outDir, nShards, capacity)
    println(s"[pipeline] exported $n cleaned docs to $outDir ($nShards shards)")
    spark.stop()
  }

  /** Returns the exported doc count. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      nShards: Int, capacity: Int): Long = {
    // the clean stage persists intermediates internally (the exact-deduped
    // corpus); scope EVERYTHING cached during this run so repeated calls
    // on a long-lived session don't accumulate corpus-sized cache entries
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val cleaned = SparkEntry.queries("q_corpus_clean")(spark, sfDir)
      .select("doc_id")
    val docs = graft.tables.Tables.documents(spark, sfDir)
      .join(cleaned, Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // packSequences and exportShards share the shard function
      // (doc_id % nShards), so each export shard carries exactly its own
      // sequences — drop the layout's shard column, export recomputes it
      val packed = graft.text.TextOps.packSequences(
          docs, "doc_id", "text", capacity, nShards)
        .drop("n_tokens", "shard")
      graft.sources.TrainingExport.exportShards(
        docs.join(packed, Seq("doc_id")), outDir, "doc_id", nShards)
      spark.read.parquet(outDir).count()
    } finally {
      docs.unpersist()
      spark.sparkContext.getPersistentRDDs
        .filter { case (id, _) => !cachedBefore.contains(id) }
        .values.foreach(_.unpersist(false))
    }
  }
}
