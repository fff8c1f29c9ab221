package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{VectorFunctions, WordShingles}
import graft.text.TextOps

/** Native expressions must agree with their composable-builtin equivalents
  * (the formulations the DuckDB oracles mirror). */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vec_dot matches higher-order aggregate formulation (float arrays)") {
    val df = Seq(
      (Array(1.0f, 2.5f, -3.0f), Array(0.5f, -1.0f, 2.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))
    ).toDF("a", "b")
    val hof = aggregate(
      zip_with(transform($"a", _.cast("double")), transform($"b", _.cast("double")),
        (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val rows = df.select(VectorFunctions.vec_dot($"a", $"b").as("native"), hof.as("ref"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("vec_dot null array yields null; interpreted eval matches codegen") {
    val df = Seq((Some(Array(1.0f, 2.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(VectorFunctions.vec_dot($"a", $"b")).collect()
    assert(r.head.isNullAt(0))
  }

  test("word_shingles matches the lambda formulation on real documents") {
    val docs = graft.tables.Tables.documents(spark, TestSpark.Sf0001).limit(200)
    val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
    val lambdaShingles = when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i, lit(3))))))
      .otherwise(array().cast("array<string>"))
    val diff = docs.select(
        TextOps.shingles(col("text"), 3).as("native"),
        lambdaShingles.as("ref"))
      .filter(not(col("native") === col("ref")))
      .count()
    assert(diff == 0)
  }

  test("word_shingles edge cases: short docs, extra whitespace, case folding") {
    val df = Seq(
      (0L, "one two"),              // < n tokens → empty
      (1L, "  A   b\tC  d "),       // whitespace runs + case folding
      (2L, "x y z x y z x y z")     // repeated shingles → distinct
    ).toDF("id", "t")
    val got = df.select(col("id"), TextOps.shingles(col("t"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(0L).isEmpty)
    assert(got(1L) == Seq("a b c", "b c d"))
    assert(got(2L).toSet == Set("x y z", "y z x", "z x y"))
  }

  test("minhash signatures: length k, deterministic, identical docs agree") {
    val df = Seq((0L, "a b c d e f g"), (1L, "a b c d e f g"),
      (2L, "completely different words here now")).toDF("doc_id", "text")
    val sigs = graft.dedup.DedupOps.minhashSignatures(df, "doc_id", "text", 3, 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs.values.forall(_.length == 64))
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L) != sigs(2L))
    val again = graft.dedup.DedupOps.minhashSignatures(df, "doc_id", "text", 3, 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(again == sigs)
  }
}
