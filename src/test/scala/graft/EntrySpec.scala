package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: driver contract — entry() non-empty, every query runs at
  * sf0.001, every oracle key refers to a real query. */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without queries: $extra")
  }

  test("query contract: oracle coverage stays complete as queries grow") {
    assert(SparkEntry.queries.size >= 39)
    assert(SparkEntry.oracleSql.size >= SparkEntry.queries.size - 4)
  }

  test("every query executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.Sf0001).count()
      withClue(name) { assert(n >= 0) }
    }
  }

  test("every contract query has an oracle (no rows-only checks left)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"queries without oracle SQL: ${rowsOnly.toSeq.sorted.mkString(", ")}")
  }
}
