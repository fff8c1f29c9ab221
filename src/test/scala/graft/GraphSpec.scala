package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.GraphOps

/** Integer fixed-point PageRank ([[GraphOps.pageRank]]): the hand case
  * pins the exact per-round arithmetic the DuckDB oracle unrolls; the
  * corpus case pins structural invariants of the bipartite ranking. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pageRank: hand-computed 3-round fixed point on a 3-node star") {
    import spark.implicits._
    // a ↔ b, a ↔ c: deg(a)=2, deg(b)=deg(c)=1
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"))
      .toDF("src", "dst")
    val got = GraphOps.pageRank(edges, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // round 1: c_a = 1e6+1e6 → r_a = 150000 + 850000·2e6 div 1e6 = 1850000
    //          c_b = 1e6 div 2 = 500000 → r_b = 575000 (= r_c)
    // round 2: r_a = 150000 + 850000·1150000 div 1e6 = 1127500
    //          r_b = 150000 + 850000·(1850000 div 2) div 1e6 = 936250
    // round 3: r_a = 150000 + 850000·1872500 div 1e6 = 1741625
    //          r_b = 150000 + 850000·(1127500 div 2) div 1e6 = 629187
    assert(got == Map("a" -> 1741625L, "b" -> 629187L, "c" -> 629187L))
  }

  test("pageRank invariants on the part–supplier graph: every node " +
      "ranked, floor respected, hubs outrank leaves") {
    val r = SparkEntry.queries("q_pagerank")(spark, TestSpark.Sf0001)
      .collect().map(x => x.getString(0) -> x.getLong(1))
    assert(r.nonEmpty)
    val (sups, parts) = r.partition(_._1.startsWith("s"))
    assert(sups.nonEmpty && parts.nonEmpty)
    // (1−d) floor: no rank below 150000 micro
    r.foreach { case (n, v) => assert(v >= 150000L, s"$n rank $v < floor") }
    // suppliers aggregate many parts' mass: the best supplier must
    // outrank the best part (each part feeds only its few suppliers)
    assert(sups.map(_._2).max > parts.map(_._2).max)
    // node set is exactly the distinct part/supplier keys of lineitem
    val li = graft.tables.Tables.lineitem(spark, TestSpark.Sf0001)
      .select("l_partkey", "l_suppkey").distinct().collect()
    val expected = li.map(x => "p" + x.get(0)).toSet ++
      li.map(x => "s" + x.get(1)).toSet
    assert(r.map(_._1).toSet == expected)
  }

  test("triangleCounts: hand graphs — K4, K4+pendant, star, duplicates/directions") {
    import spark.implicits._
    def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
      GraphOps.triangleCounts(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4: every vertex sits in C(3,2)=3 of the 4 triangles
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(counts(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // a pendant vertex joins no triangle and must be absent
    assert(counts(k4 :+ (4L, 5L)) ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // a star is triangle-free — the hub's degree creates no wedge at
    // itself under degree orientation (and no output at all)
    assert(counts(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))).isEmpty)
    // duplicate edges, both directions, and self-loops don't change
    // the undirected simple graph
    val noisy = k4 ++ k4.map(_.swap) ++ Seq((1L, 1L), (2L, 3L), (2L, 3L))
    assert(counts(noisy) == counts(k4))
  }

  test("clusteringCoefficients: K4+pendant hand values; deg<2 excluded") {
    import spark.implicits._
    val k4p = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L)).toDF("a", "b")
    val got = GraphOps.clusteringCoefficients(k4p, "a", "b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // 1..3: deg 3, tri 3 → C = 2·3/(3·2) = 1.0
    // 4: deg 4 (pendant edge), tri 3 → C = 6/12 = 0.5
    // 5: deg 1 → excluded (C undefined)
    assert(got == Map(
      1L -> ((3L, 3L, 1.0)), 2L -> ((3L, 3L, 1.0)), 3L -> ((3L, 3L, 1.0)),
      4L -> ((4L, 3L, 0.5))))
    // triangle-free: a path's middle node has deg 2 and coef 0
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val p = GraphOps.clusteringCoefficients(path, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(p == Map(2L -> 0.0))
  }

  test("q_triangle_count: totals consistent and plan is equi-join only") {
    val df = SparkEntry.queries("q_triangle_count")(spark, TestSpark.Sf0001)
    val p = df.queryExecution.executedPlan.toString
    // wedge + closing joins must be equi-joins — no nested loop over
    // the neighbor lists, no cartesian
    assert(!p.contains("BroadcastNestedLoopJoin"), p.linesIterator.take(25).mkString("\n"))
    assert(!p.contains("CartesianProduct"))
    val rows = df.collect()
    // per-node participations sum to 3 per triangle
    assert(rows.map(_.getLong(1)).sum % 3 == 0)
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("bfsHops: hand path+branch — min-hop wins, unreachable absent, " +
      "seeds stay at 0") {
    import spark.implicits._
    // a→b→c→d chain, a→c shortcut (c reachable at hop 1 AND 2 — min
    // wins), e isolated, b also a seed (its hop-0 beats a's hop-1)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"),
      ("x", "y")).toDF("src", "dst")
    val seeds = Seq("a", "b").toDF("node")
    val got = GraphOps.bfsHops(edges, seeds, maxHops = 3)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 0, "b" -> 0, "c" -> 1, "d" -> 2))
  }

  test("minCostPaths: a later cheap 2-edge path beats the earlier " +
      "direct edge — no settled-set shortcut") {
    import spark.implicits._
    // a→b direct costs 5, but a→c→b costs 2; d only direct at 10
    val edges = Seq(("a", "b", 5L), ("a", "c", 1L), ("c", "b", 1L),
      ("a", "d", 10L)).toDF("src", "dst", "w")
    val seeds = Seq("a").toDF("node")
    val got = GraphOps.minCostPaths(edges, seeds, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 0L, "b" -> 2L, "c" -> 1L, "d" -> 10L))
    // with one round only, b still carries the direct-edge cost
    val oneRound = GraphOps.minCostPaths(edges, seeds, rounds = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(oneRound("b") == 5L)
  }

  test("labelPropagation: two bridged triangles split into two " +
      "communities (≠ connected components); mode beats min on ties") {
    import spark.implicits._
    // triangles {a,b,c} and {d,e,f}, bridge c–d — one component, but
    // 3 LPA rounds settle into TWO communities; and in round 2 node d
    // sees labels {a, d, d} and must keep d (count 2 beats the smaller
    // label a), pinning mode-over-min
    val und = Seq(("a","b"),("b","c"),("a","c"),("d","e"),("e","f"),
      ("d","f"),("c","d"))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.labelPropagation(edges, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "c", "e" -> "c", "f" -> "c"), got.toString)
    assert(got.values.toSet.size == 2, "expected two communities")
  }

  test("q_bfs_hops: bipartite parity — odd hops are parts, even are " +
      "suppliers; counts bounded by the key domains") {
    val rows = SparkEntry.queries("q_bfs_hops")(spark, TestSpark.Sf0001)
      .collect()
    assert(rows.nonEmpty && rows.head.getInt(0) == 0)
    rows.foreach { r =>
      val (hop, first, last) = (r.getInt(0), r.getString(2), r.getString(3))
      val side = if (hop % 2 == 0) "s" else "p"
      assert(first.startsWith(side) && last.startsWith(side),
        s"hop $hop crossed bipartite sides: $first..$last")
      assert(r.getLong(1) > 0)
    }
  }
}
