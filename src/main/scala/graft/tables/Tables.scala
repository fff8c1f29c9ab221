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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native type
    * for — read it as raw nanos and truncate to microseconds (same
    * conversion DuckDB applies, so oracles agree).
    *
    * SESSION-WIDE SIDE EFFECT, by design: sets
    * `spark.sql.legacy.parquet.nanosAsLong` on the caller's session and
    * never restores it (the conf is read at scan time, after this method
    * returns). The mutation is idempotent and value-stable, so concurrent
    * callers commute; a session that must read OTHER nanos-timestamp
    * parquet as timestamps should use a separate `spark.newSession()`.
    *
    * The derived timestamp is NOT a scan column, so a filter on it cannot
    * reach the parquet reader — at archive scale that is a full scan. The
    * raw long is therefore kept as [[EventsTsNanosCol]]; windowFilter adds a
    * redundant nanos-space predicate on it, restoring row-group skipping. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      .withColumn(EventsTsNanosCol, org.apache.spark.sql.functions.col("ts"))
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
