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
    * CONF SCOPING: reading either legacy layout needs
    * `spark.sql.legacy.parquet.nanosAsLong=true` (an annotated
    * TIMESTAMP(NANOS) column otherwise FAILS analysis with
    * PARQUET_TYPE_ILLEGAL) and `spark.sql.parquet.inferTimestampNTZ.enabled
    * =false` (a timezone-less micros archive otherwise infers TIMESTAMP_NTZ
    * instead of the session-UTC TimestampType every downstream op and
    * oracle expects). Both confs are consulted only while the read schema
    * is RESOLVED; execution decodes by the already-resolved schema and
    * never re-reads them (verified empirically: post-restore actions on
    * both an annotated-nanos file and an NTZ-micros file return correct
    * values with filters still pushed — pinned by ConfScopeSpec). So this
    * method applies them via [[withTsReadConfs]], which restores the
    * caller's values before returning: co-resident workloads on the same
    * session observe no conf drift. */
  def events(spark: SparkSession, dir: String): DataFrame =
    withTsReadConfs(spark) { adaptTs(read(spark, dir, "events")) }

  /** Apply the two legacy parquet-timestamp read confs around `body`
    * (which must force schema resolution of any frame it returns — a
    * plain `spark.read.parquet(...)` already does, eagerly) and restore
    * the caller's previous values afterwards, set-or-unset exactly. Shared
    * by the batch reader above and the streaming source
    * ([[graft.streaming.StreamingOps.eventsStream]]), so both paths scope
    * identically. Not thread-atomic: two threads interleaving on the SAME
    * session can observe each other's window — the service layer reads
    * tables once per session at startup, and the streaming drivers run in
    * their own child sessions, so the window is uncontended in practice. */
  def withTsReadConfs[A](spark: SparkSession)(body: => A): A = {
    val keys = Seq("spark.sql.legacy.parquet.nanosAsLong" -> "true",
                   "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false")
    // getOption reports the session DEFAULT for a never-set conf, so
    // explicit-set-ness must come from getAll (set entries only) — restoring
    // a default by setting it explicitly would be value-equivalent but
    // observable drift (the key starts appearing in getAll / hadoopConf).
    val explicitlySet = spark.conf.getAll
    val prev = keys.map { case (k, _) => k -> explicitlySet.get(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
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
