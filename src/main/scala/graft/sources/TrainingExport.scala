package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sharded training-corpus export — the sink end of the pack-and-export
  * pipeline (see [[graft.text.TextOps.packSequences]], which uses the same
  * `id % nShards` shard function, so a shard's sequences are fully
  * contained in that shard's files).
  *
  * Layout: `root/shard=K/part-....parquet`, one file per shard, rows sorted
  * by id within the file. One file per shard is the point, not a
  * limitation: training readers stream shards sequentially, so the shard
  * count (not a file count within a shard) is the read-parallelism knob —
  * size `nShards` so one shard ≈ one reader's appetite (e.g. 100 TB / 1024
  * shards ≈ 100 GB per reader stream). The `repartition` on the shard key
  * is the single shuffle; `sortWithinPartitions` makes every file
  * deterministic given (corpus, nShards) so re-exports are byte-comparable
  * and resumable training sees a stable order.
  *
  * The shard→task mapping is HASHED, not identity: all rows of a shard land
  * in one task (one file per dir holds), but hash collisions can give one
  * task 2+ shards while another sits idle — balls-in-bins says the busiest
  * task carries ~ln n/ln ln n shards at large nShards, so export wall-clock
  * trails the ideal by that factor. If that tail matters, drop to an RDD
  * `partitionBy` with an identity partitioner on the shard value; the
  * DataFrame API alone cannot express one. */
object TrainingExport {

  def exportShards(df: DataFrame, root: String, idCol: String,
      nShards: Int): Unit = {
    require(nShards > 0)
    df.withColumn("shard", pmod(col(idCol), lit(nShards)).cast("int"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", idCol)
      .write.mode("overwrite")
      .option("compression", "zstd")
      .partitionBy("shard")
      .parquet(root)
  }
}
