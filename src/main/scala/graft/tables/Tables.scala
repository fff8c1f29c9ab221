package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * Each table is a single parquet file per scale-factor directory. At 100 TB
  * these become directory-partitioned datasets; every reader here takes the
  * dataset root so swapping `file.parquet` for a partitioned `dir/` is a
  * one-line change. Column pruning + predicate pushdown reach the scan
  * because callers compose plain `select`/`filter` on the returned frame.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "lineitem")
  /** Raw-nanos shadow of the events `ts` column, kept so time predicates
    * can be pushed into the parquet scan (see TimeseriesOps.windowFilter). */
  val EventsTsNanosCol = "__ts_ns"

  /** SCHEMA-ADAPTIVE events reader. The archive's `ts` column has shipped
    * in two physical encodings across environment generations:
    *
    *  - parquet TIMESTAMP(NANOS) (or a raw int64 epoch-nanos column) —
    *    Spark has no nanos timestamp type, so with
    *    `spark.sql.legacy.parquet.nanosAsLong` it reads as LongType; we
    *    keep the raw long as [[EventsTsNanosCol]] and derive a µs-truncated
    *    `ts` (same conversion DuckDB applies, so oracles agree). The
    *    derived timestamp is NOT a scan column, so a filter on it cannot
    *    reach the parquet reader — windowFilter and
    *    [[graft.plans.NanosPredicatePushdown]] add redundant nanos-space
    *    predicates on the raw column, restoring row-group skipping.
    *  - native TIMESTAMP_MICROS (what this engine's own writers and the
    *    current testdata produce) — used directly; filters on `ts` push to
    *    the scan natively and no shadow column exists.
    *
    * The branch is on the dtype Spark actually READ, never on an assumed
    * layout — round 9's testdata regeneration (nanos → micros) broke 26
    * queries loudly and 3 silently because this method pinned one encoding.
    *
    * SESSION-WIDE SIDE EFFECTS, by design: sets
    * `spark.sql.legacy.parquet.nanosAsLong=true` (so a nanos archive reads
    * as long instead of failing analysis) and
    * `spark.sql.parquet.inferTimestampNTZ.enabled=false` (so a
    * timezone-less micros archive reads as session-UTC TimestampType — the
    * type every downstream op and oracle expects — rather than
    * TIMESTAMP_NTZ) and never restores them (the confs are read at scan
    * time, after this method returns). Both mutations are idempotent and
    * value-stable, so concurrent callers commute; a session that needs
    * different parquet timestamp semantics should use a separate
    * `spark.newSession()`. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = read(spark, dir, "events")
    adaptTs(raw)
  }

  /** Apply the nanos-vs-native branch to a frame whose `ts` column came
    * off a parquet scan (shared by the batch reader and the streaming
    * source, so both paths adapt identically). */
  def adaptTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn(EventsTsNanosCol, col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case TimestampNTZType =>
        // reachable only if the NTZ-inference conf was overridden upstream;
        // session tz is UTC so the reinterpretation is value-preserving
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts read as unsupported type $other — expected int64 nanos " +
          "or a parquet timestamp; regenerate the archive or extend Tables.adaptTs")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
