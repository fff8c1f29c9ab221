package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MisraGriesAgg
import graft.ops.FrequencyOps

/** Misra-Gries frequent-items summary + the two-pass exact heavy-hitter
  * protocol built on it. The state is ORDER-DEPENDENT (different
  * partitionings yield different candidate maps), so these tests pin the
  * two things that are invariant: the superset guarantee (every key with
  * freq > n/(k+1) is present, any split) and the determinism of the
  * recounted final answer. */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** One hot key among many singletons — forces the decrement path. */
  private def skewed(nHot: Int, nNoise: Int) =
    (Seq.fill(nHot)("hot") ++ (0 until nNoise).map(i => s"noise_$i"))

  test("mg state: n counts every row; entries bounded by k; lb ≤ true count") {
    val df = skewed(200, 400).toDF("key").repartition(7)
    val row = df.agg(MisraGriesAgg.misra_gries(col("key"), 8).as("mg"))
      .select(col("mg.n"), col("mg.entries")).head()
    assert(row.getLong(0) == 600L)
    val entries = row.getSeq[org.apache.spark.sql.Row](1)
    assert(entries.size <= 8)
    // every counter is a lower bound on the true count
    entries.foreach { e =>
      val (key, lb) = (e.getString(0), e.getLong(1))
      val truth = if (key == "hot") 200L else 1L
      assert(lb <= truth, s"$key: lb=$lb > true=$truth")
    }
    // entries sorted (lb desc, key)
    val lbs = entries.map(_.getLong(1))
    assert(lbs == lbs.sortBy(-_))
  }

  test("mg guarantee: freq > n/(k+1) keys survive any partitioning") {
    val data = skewed(300, 900) // n=1200, hot freq 300 > 1200/9 for k=8
    for (parts <- Seq(1, 3, 13, 32)) {
      val row = data.toDF("key").repartition(parts)
        .agg(MisraGriesAgg.misra_gries(col("key"), 8).as("mg"))
        .select(col("mg.entries.key")).head()
      assert(row.getSeq[String](0).contains("hot"), s"parts=$parts lost the hot key")
    }
  }

  test("decrement path: more distinct keys than counters never crashes, " +
       "keeps ≤ k, and a solo-partition run matches the classic algorithm") {
    // single partition → deterministic classic MG; replay it in Scala
    val items = Seq("a", "b", "a", "c", "a", "d", "a", "e", "a", "f")
    val k = 2
    val expected = {
      val m = scala.collection.mutable.LinkedHashMap[String, Long]()
      items.foreach { x =>
        if (m.contains(x)) m(x) += 1
        else if (m.size < k) m(x) = 1
        else m.mapValuesInPlace((_, v) => v - 1).filterInPlace((_, v) => v > 0)
      }
      m.toMap
    }
    val row = items.toDF("key").coalesce(1)
      .agg(MisraGriesAgg.misra_gries(col("key"), k).as("mg"))
      .select(col("mg.entries")).head()
    val got = row.getSeq[org.apache.spark.sql.Row](0)
      .map(e => e.getString(0) -> e.getLong(1)).toMap
    assert(got == expected)
  }

  test("merge subtraction keeps ≤ k entries and the n/(k+1) error bound") {
    val df = (skewed(500, 2000) ++ skewed(400, 0)).toDF("key").repartition(31)
    val k = 4
    val row = df.agg(MisraGriesAgg.misra_gries(col("key"), k).as("mg"))
      .select(col("mg.n"), col("mg.entries")).head()
    val n = row.getLong(0)
    val entries = row.getSeq[org.apache.spark.sql.Row](1)
      .map(e => e.getString(0) -> e.getLong(1)).toMap
    assert(entries.size <= k)
    // hot freq 900 > n/(k+1) = 2900/5 → guaranteed present, and its
    // counter undercounts by at most n/(k+1)
    assert(entries.contains("hot"))
    assert(entries("hot") >= 900L - n / (k + 1))
  }

  test("two-pass exact heavy hitters ≡ groupBy-count-filter, any split") {
    val data = skewed(300, 50) ++ Seq.fill(100)("warm") ++ Seq.fill(20)("cool")
    val k = 6 // threshold n/k = 470/6 ≈ 78 → {hot, warm}
    val expected = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > data.size }.toMap
    for (parts <- Seq(1, 5, 17)) {
      val df = data.toDF("key").repartition(parts)
      val got = FrequencyOps.exactHeavyHitters(df, "key", k)
        .as[(String, Long)].collect().toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("empty candidate set (near-uniform keys, tiny k) → empty result, no crash") {
    val df = (0 until 300).map(i => s"u_${i % 100}").toDF("key")
    val out = FrequencyOps.exactHeavyHitters(df, "key", 3)
    assert(out.count() == 0)
  }

  test("streamed pass 1 ≡ batch at the ANSWER level (state differs, answer can't)") {
    val dir = TestSpark.Sf0001
    val mg = graft.streaming.StreamingOps.runStreamMgOnce(spark, dir, 30)
      .select(col("mg.n"), col("mg.entries.key")).head()
    val words = graft.tables.Tables.documents(spark, dir)
      .select(explode(graft.text.TextOps.wsTokens(lower(col("text")))).as("word"))
    val streamed = FrequencyOps.recountHeavy(words, "word", 30,
        mg.getLong(0), mg.getSeq[String](1))
      .as[(String, Long)].collect().toMap
    val batch = FrequencyOps.exactHeavyHitters(words, "word", 30)
      .as[(String, Long)].collect().toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("non-string key rejected at ANALYSIS time, not executor runtime") {
    import spark.implicits._
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L, 2L).toDF("k")
        .agg(graft.functions.MisraGriesAgg.misra_gries(col("k"), 4))
        .collect()
    }
    assert(e.getMessage.contains("misra_gries"),
      s"expected the type-check message, got: ${e.getMessage}")
  }

  test("SQL registration: misra_gries callable from spark.sql") {
    graft.functions.GraftFunctions.register(spark)
    skewed(50, 10).toDF("key").createOrReplaceTempView("mg_in")
    val row = spark.sql(
      "SELECT misra_gries(key, 4) AS mg FROM mg_in")
      .select(col("mg.n")).head()
    assert(row.getLong(0) == 60L)
    spark.catalog.dropTempView("mg_in")
  }
}
