package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SCHEMA-DRIFT CANARY. Opens every driver-generated table and checks the
  * dtypes the engine actually depends on, failing with a named diagnosis.
  *
  * Motivation: between rounds 8 and 9 the testdata was silently
  * regenerated with `events.ts` as native TIMESTAMP_MICROS instead of
  * TIMESTAMP(NANOS); the engine had pinned the nanos layout, 26 batch
  * queries failed analysis and 3 streaming queries returned wrong answers.
  * This spec makes the next environment change cost one red test line with
  * the drift spelled out, not a round of forensic debugging.
  *
  * The `ts` check is deliberately permissive: [[graft.tables.Tables.adaptTs]]
  * accepts int64-nanos AND native-timestamp layouts, so the canary accepts
  * exactly the set the engine adapts to and names anything outside it.
  */
class SchemaCanarySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def raw(name: String) =
    spark.read.parquet(s"${TestSpark.Sf0001}/$name.parquet").schema

  /** Integer-family check (the generator has shipped both int32 and int64
    * for key columns; every consumer reads them through Long-compatible
    * arithmetic, so either is fine — anything else is drift). */
  private def integral(dt: DataType): Boolean =
    dt == IntegerType || dt == LongType

  private def check(table: String, col: String, ok: DataType => Boolean,
      expect: String): Unit = {
    val schema = raw(table)
    assert(schema.fieldNames.contains(col),
      s"SCHEMA DRIFT: $table.$col is MISSING (expected $expect); " +
        s"present columns: ${schema.fieldNames.mkString(", ")}")
    val dt = schema(col).dataType
    assert(ok(dt),
      s"SCHEMA DRIFT: $table.$col read as $dt, engine expects $expect — " +
        "if the generator changed encoding again, extend Tables/adaptTs " +
        "and this canary together")
  }

  test("events: engine-compatible layout (the round-9 breakage, pinned)") {
    // nanos-as-long OR native timestamp — the two layouts adaptTs handles
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    check("events", "ts",
      dt => dt == LongType || dt == TimestampType || dt == TimestampNTZType,
      "int64 epoch-nanos or parquet timestamp")
    check("events", "event_id", integral, "integral")
    check("events", "user_id", integral, "integral")
    check("events", "event_type", _ == StringType, "string")
    check("events", "value", _ == DoubleType, "double")
    check("events", "props", _ == StringType, "string")
    // and the adapted frame always surfaces TimestampType
    val adapted = graft.tables.Tables.events(spark, TestSpark.Sf0001)
    assert(adapted.schema("ts").dataType == TimestampType,
      s"Tables.events surfaced ts as ${adapted.schema("ts").dataType}")
  }

  test("documents: text-pipeline columns") {
    check("documents", "doc_id", integral, "integral")
    check("documents", "text", _ == StringType, "string")
    check("documents", "lang", _ == StringType, "string")
    check("documents", "source", _ == StringType, "string")
    check("documents", "n_chars", integral, "integral")
  }

  test("embeddings: vector column shape") {
    check("embeddings", "vec_id", integral, "integral")
    check("embeddings", "label", integral, "integral")
    check("embeddings", "embedding",
      { case ArrayType(FloatType | DoubleType, _) => true; case _ => false },
      "array<float|double>")
  }

  test("tpch tables: join keys, measures, and the orders date column") {
    check("region", "r_regionkey", integral, "integral")
    check("nation", "n_nationkey", integral, "integral")
    check("nation", "n_regionkey", integral, "integral")
    check("customer", "c_custkey", integral, "integral")
    check("customer", "c_nationkey", integral, "integral")
    check("customer", "c_acctbal", _ == DoubleType, "double")
    check("supplier", "s_suppkey", integral, "integral")
    check("supplier", "s_nationkey", integral, "integral")
    check("part", "p_partkey", integral, "integral")
    check("part", "p_size", integral, "integral")
    check("orders", "o_orderkey", integral, "integral")
    check("orders", "o_custkey", integral, "integral")
    check("orders", "o_totalprice", _ == DoubleType, "double")
    check("orders", "o_orderdate",
      dt => dt == TimestampType || dt == TimestampNTZType || dt == DateType,
      "timestamp or date")
    check("lineitem", "l_orderkey", integral, "integral")
    check("lineitem", "l_partkey", integral, "integral")
    check("lineitem", "l_suppkey", integral, "integral")
    check("lineitem", "l_quantity", _ == DoubleType, "double")
    check("lineitem", "l_extendedprice", _ == DoubleType, "double")
    check("lineitem", "l_discount", _ == DoubleType, "double")
    check("lineitem", "l_shipdate",
      dt => dt == TimestampType || dt == TimestampNTZType || dt == DateType,
      "timestamp or date")
  }

  test("every exactMilli-consumed column is milli-exact (<= 3 decimals) " +
      "at every scale dir present — the precision contract the " +
      "determinism-grade mean paths quantize at") {
    // The determinism-grade mean paths (ResampleOps.meanOf(exactMilli),
    // resampleMeanMilli, windowedMeanMilli and their oracle mirrors)
    // accumulate round(value*1000) longs — EXACT only while the
    // generator writes <= 3-decimal values. The canary must cover the
    // FULL surface the flag is applied to (events.value AND the lineitem
    // measures; q1_agg/q_table_stats/q_histogram run exactMilli over
    // l_quantity/l_discount) and every generated scale dir, not just the
    // sf0.001 fixture — a finer-precision regeneration of sf0.1 alone
    // would otherwise produce wrong means with no failing test.
    //
    // Exactness test: DECIMAL(38,3) round-trip, NOT double arithmetic —
    // |v*1000 - round(v*1000)| > 1e-9 false-positives above |v| ~ 1e4
    // where the representation error of a genuinely milli-exact double
    // exceeds the absolute tolerance. Cast-to-decimal goes through the
    // shortest-decimal-string (BigDecimal.valueOf) semantics, so a value
    // written as a <= 3-decimal literal round-trips bit-identically at
    // any magnitude, while real extra precision is rounded and detected.
    import org.apache.spark.sql.functions._
    val surface = Seq( // (table, column) consumed under exactMilli = true
      "events" -> "value",
      "lineitem" -> "l_quantity",
      "lineitem" -> "l_discount")
    val scaleDirs = new java.io.File("/root/testdata").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("sf"))
      .map(_.getAbsolutePath).sorted
    assert(scaleDirs.nonEmpty, "no scale dirs under /root/testdata")
    for (dir <- scaleDirs; (table, column) <- surface) {
      val offGrid = spark.read.parquet(s"$dir/$table.parquet")
        .filter(!isnan(col(column)) && col(column).isNotNull &&
          abs(col(column)) < lit(Double.PositiveInfinity))
        .filter(col(column).cast("decimal(38,3)").cast("double") =!= col(column))
        .count()
      assert(offGrid == 0L,
        s"PRECISION DRIFT: $offGrid $table.$column rows at $dir are not " +
          "milli-exact — the exactMilli unit scale (and its oracle " +
          "mirrors) now round real precision away; raise the unit scale " +
          "in ResampleOps.meanOf and the mirrored oracle SQL together")
    }
  }
}
