package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions — the scale contract (SURVEY §4).
  * A passing result set with a broken plan (no pushdown, no broadcast,
  * accidental cartesian) is a failure at 100 TB even though small-SF
  * correctness is green; pin the plans. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString

  test("q_asof_join (the PRIMARY as-of entry point) plans the custom " +
      "AsOfJoinExec merge — no Window, no Union (the composition's " +
      "machinery); the string-keyed twin takes the same operator") {
    Seq("q_asof_join", "q_asof_join_str").foreach { q =>
      val p = plan(q)
      assert(p.contains("AsOfJoin"), s"$q:\n${p.take(2000)}")
      assert(!p.contains("Window") && !p.contains("Union"),
        s"$q fell back to the composition:\n${p.take(2000)}")
    }
  }

  test("time-window predicate reaches the events parquet scan (P1 pushdown)") {
    // native-micros layout (current testdata): the window bounds on `ts`
    // must land in PushedFilters — parquet row-group min/max skipping —
    // not only in a post-scan Filter
    val p = plan("q_ts_points")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("GreaterThanOrEqual(ts,") && pushed.contains("LessThan(ts,"),
      p.linesIterator.take(30).mkString("\n"))
  }

  test("time-window predicate pushes at the NANOS layout too (P1 pushdown)") {
    // legacy nanos archive (self-generated fixture): the exact predicate is
    // on the DERIVED timestamp, which can't reach the reader — the
    // raw-nanos shadow conjunct windowFilter adds must appear in
    // PushedFilters so row-group skipping survives that layout as well
    val p = graft.ops.TimeseriesOps.windowFilter(
        graft.tables.Tables.events(spark, TestSpark.NanosFixtureDir), "ts",
        java.time.Instant.parse("2024-01-05T00:00:00Z"),
        java.time.Instant.parse("2024-01-12T00:00:00Z"))
      .select("event_id", "value")
      .queryExecution.executedPlan.toString
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("GreaterThanOrEqual(ts,1704") && pushed.contains("LessThan(ts,1705"),
      p.linesIterator.take(30).mkString("\n"))
  }

  test("dimension joins broadcast; no cartesian products (q_revenue_by_nation)") {
    val p = plan("q_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("fact × fact join resolves to SortMergeJoin, never broadcast (q_fact_join_smj)") {
    // the hinted contract plan: SMJ at every scale, no broadcast of a
    // "small" side that is only small at test SF
    val p = plan("q_fact_join_smj")
    assert(p.contains("SortMergeJoin"), p.linesIterator.take(25).mkString("\n"))
    assert(!p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("UNHINTED fact join picks SMJ on its own once broadcast is off the table") {
    // the 100 TB regime modeled: with both broadcast thresholds
    // disabled (= both sides exceed them), plain planner join selection
    // must land on sort-merge — the engine's default large-join path
    // needs no hint when the stats say 'big'
    val ses = spark.newSession()
    ses.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ses.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val li = graft.tables.Tables.lineitem(ses, TestSpark.Sf0001)
    val o = graft.tables.Tables.orders(ses, TestSpark.Sf0001)
    val p = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(org.apache.spark.sql.functions.col("o_orderpriority"))
      .count()
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p.linesIterator.take(25).mkString("\n"))
    assert(!p.contains("BroadcastHashJoin"))
  }

  test("co-bucketed fact join: no Exchange below the join on either side " +
       "(q_fact_join_bucketed)") {
    val df = SparkEntry.queries("q_fact_join_bucketed")(spark, TestSpark.Sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p.linesIterator.take(25).mkString("\n"))
    // everything below the SortMergeJoin is its subtree (plans print
    // top-down): the join's inputs must carry NO Exchange — the bucketed
    // layout satisfies the join's clustering; only the downstream
    // groupBy/orderBy may shuffle
    val joinSubtree = p.substring(p.indexOf("SortMergeJoin"))
    assert(!joinSubtree.contains("Exchange"), p)
    assert(p.contains("Bucketed: true"), p)
  }

  test("coverage overlap joins broadcast (tiny catalog side)") {
    val p = plan("q_coverage_overlap")
    assert(p.contains("Broadcast"))
    assert(!p.contains("CartesianProduct"))
  }

  test("resample aggregations are partial→final hash aggregates") {
    val p = plan("q_resample_broadband")
    assert(p.contains("HashAggregate"))
    // partial + final pair → exactly one shuffle for the agg
    assert("Exchange".r.findAllIn(p).size <= 2) // agg + final sort
  }

  test("column pruning: token stats reads only doc_id and text") {
    val p = plan("q_token_stats")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text"))
    assert(!read.contains("lang") && !read.contains("source"))
  }

  test("brute-force top-k broadcasts the query side, not the corpus") {
    val p = plan("q_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("ANN rank stages: bounded-heap aggregate, never a corpus-sized window") {
    // the row_number() formulation would shuffle the full queries×corpus
    // candidate frame into |queries| partitions and sort each in ONE task —
    // the ranks must run as the TopKByAgg partial aggregate instead. The
    // only Window allowed in any ANN plan is the probe-cell assignment over
    // the bounded QUERY frame (ivf/ivfpq); the brute-force/LSH/PQ plans
    // must be window-free.
    for (q <- Seq("q_cosine_topk", "q_ann_pq", "q_ann_lsh", "q_hard_negatives",
        "q_proto_prune")) {
      val p = plan(q)
      assert(p.contains("ObjectHashAggregate"), s"$q: no heap aggregate\n$p")
      assert(!p.linesIterator.exists(_.matches(".*\\bWindow \\[.*")),
        s"$q: unexpected Window node")
    }
    for (q <- Seq("q_ann_ivf", "q_ann_ivfpq", "q_ann_pq_trained",
        "q_ann_ivfpq_res")) {
      val p = plan(q)
      assert(p.contains("ObjectHashAggregate"), s"$q: no heap aggregate\n$p")
      val windows = p.linesIterator.count(_.matches(".*\\bWindow \\[.*"))
      assert(windows <= 1, s"$q: $windows Window nodes (probe-only allowed)")
    }
  }

  test("CMS audit: constant-size sketch partials, window-free") {
    val p = plan("q_cms_counts")
    // sketch side: partial ObjectHashAggregate per partition (16 KiB
    // buffers) → SinglePartition merge; exact side: vocab-sized hash agg;
    // plus the serving-edge sort. No window, no extra corpus shuffle.
    assert(p.contains("ObjectHashAggregate"), s"no imperative sketch agg\n$p")
    assert(!p.linesIterator.exists(_.matches(".*\\bWindow \\[.*")))
    assert("Exchange".r.findAllIn(p).size <= 4, s"unexpected exchanges\n$p")
  }

  test("HLL distinct: constant-size register partials, window-free") {
    val p = plan("q_hll_distinct")
    // register side: partial ObjectHashAggregate per partition (512 B
    // buffers) → per-lang merge; the exact audit column broadcasts back.
    assert(p.contains("ObjectHashAggregate"), s"no imperative register agg\n$p")
    assert(p.contains("BroadcastHashJoin"), s"exact audit side not broadcast\n$p")
    assert(!p.linesIterator.exists(_.matches(".*\\bWindow \\[.*")))
  }

  test("source quota: bounded-heap rank, never a per-source window") {
    val p = plan("q_source_quota")
    // the per-source cap must be the topk_by heap (≤ K entries per source
    // per partition BEFORE the exchange) — a row_number window would
    // funnel the corpus into |sources| partitions, the skew scale-killer
    assert(p.contains("ObjectHashAggregate"), s"no heap agg\n$p")
    assert(!p.linesIterator.exists(_.matches(".*\\bWindow \\[.*")),
      "unexpected Window node")
  }

  test("DSIR weights: broadcast lambda table, no corpus-sized window") {
    val p = plan("q_dsir_weights")
    // bucket counts and the λ table are buckets-sized → broadcast joins
    // back onto the token stream; per-doc accumulation is a partial→final
    // hash aggregate, never a window or a cartesian
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(40).mkString("\n"))
    assert(!p.linesIterator.exists(_.matches(".*\\bWindow \\[.*")), "unexpected Window")
    assert(!p.contains("CartesianProduct"))
  }

  test("exact pair scan is a block-pair equi-join: no nested loop over n²") {
    val p = plan("q_cosine_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"), "corpus-sized nested loop")
    assert(!p.contains("CartesianProduct"))
  }

  test("LSH pair scan: equi-joins only, no nested loop") {
    val p = plan("q_cosine_pairs_lsh")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("contamination joins broadcast the small eval side over the corpus") {
    val p = plan("q_contamination")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    // the eval-set filter is pushed into its own scan, not applied post-read
    assert(p.contains("PushedFilters: [IsNotNull(doc_id)") || p.contains("% 100"))
  }

  test("sequence packing: window partitioned by shard, never global") {
    val p = plan("q_pack_sequences")
    // a Window whose partition spec is empty would funnel the corpus
    // through one task; the packing window must carry the shard key
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty)
    assert(winLines.forall(_.contains("shard")), winLines.mkString("\n"))
    assert(!p.contains("CartesianProduct"))
  }

  test("embedding dedup: equi-join pair scans, no nested loop (both variants)") {
    Seq("q_dedup_embed", "q_dedup_embed_lsh").foreach { q =>
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: corpus nested loop")
      assert(!p.contains("CartesianProduct"), q)
    }
  }

  test("IVF corpus assignment aggregates (max_by), no corpus-side window") {
    val p = plan("q_ann_ivf")
    // exactly one window remains: the (small) query-side probe assignment —
    // corpus cell assignment is a partial→final max_by aggregate and the
    // per-query rank is the bounded-heap aggregate
    val windows = p.linesIterator.count(_.matches(".*\\bWindow \\[.*"))
    assert(windows <= 1, s"$windows Window nodes:\n$p")
    assert(p.contains("max_by"))
  }

  test("topk_agg: partial object-hash aggregate, no Window, no full sort") {
    val p = plan("q_topk_agg")
    // the top-k heap runs as a TypedImperativeAggregate (ObjectHashAggregate
    // exec) with a partial stage before the exchange; the rank-window
    // formulation this replaces would show a Window over a sorted exchange
    assert(p.contains("ObjectHashAggregate"), p.linesIterator.take(40).mkString("\n"))
    assert(!p.linesIterator.exists(_.matches(".*\\bWindow \\[.*")), "unexpected Window")
  }

  test("salted join scatters the fact side across salt sub-keys") {
    val p = plan("q_salted_join")
    // the join key must include the synthetic salt (hot-key rows split
    // across salts reducers) and replication must not degrade to a
    // cartesian product
    assert(p.contains("__salt"), p.linesIterator.take(40).mkString("\n"))
    assert(!p.contains("CartesianProduct"))
  }

  test("bloom semi-join: might_contain literal filters the fact scan") {
    val p = plan("q_bloom_semi")
    // the bloom probe must sit in a scan-side Filter (a literal blob, no
    // join, no exchange to evaluate it); the exact verify join follows
    assert(p.contains("might_contain"), p.linesIterator.take(40).mkString("\n"))
    assert(!p.contains("CartesianProduct"))
  }

  test("vocab pick is a distributed TakeOrdered, not a single-reducer sort") {
    val p = plan("q_vocab_oov")
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.take(40).mkString("\n"))
    // the ≤200-row vocab side then broadcasts onto the token stream
    assert(p.contains("BroadcastHashJoin"))
  }

  test("stratified sample: bounded-heap aggregate, no per-stratum window") {
    val p = plan("q_strat_sample")
    assert(p.contains("ObjectHashAggregate"), p.linesIterator.take(40).mkString("\n"))
    assert(!p.linesIterator.exists(_.matches(".*\\bWindow \\[.*")), "unexpected Window")
  }

  test("mixture sample and quantization stay map-only before the output sort") {
    for (q <- Seq("q_mix_sample", "q_embed_quant")) {
      val p = plan(q)
      // one Exchange at most (the rangepartitioning for orderBy)
      assert("Exchange".r.findAllIn(p).size <= 1, s"$q:\n$p")
    }
  }

  test("Gopher rules stay map-only before the output sort") {
    val p = plan("q_gopher_rules")
    assert("Exchange".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("HashAggregate"), "unexpected aggregate in a map-only filter pass")
  }

  test("substring dedup: equi-joins only, doc-bounded windows") {
    // the hit join must be a hash/sort-merge equi-join on the window hash
    // (one output row per gram occurrence) and every Window must partition
    // by the doc id — never a corpus-global sort, never a nested loop
    for (q <- Seq("q_substr_dedup", "q_substr_keep1", "q_substr_clean")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q:\n${p.take(2000)}")
      p.linesIterator.filter(_.matches(".*\\bWindow \\[.*")).foreach { l =>
        assert(l.contains("doc_id"), s"$q window not doc-partitioned: $l")
      }
    }
  }

  test("BM25: broadcast query-term filter before any exchange; heap rank; no window") {
    // the corpus-sized exploded token stream must hit a BroadcastHashJoin
    // on the tiny term set BEFORE the postings aggregate shuffles, the
    // rank must be the bounded-heap aggregate (window-free plan), and the
    // scan must prune to (doc_id, text)
    val p = plan("q_bm25_topk")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.linesIterator.exists(_.matches(".*\\bWindow \\[.*")), p.take(2000))
    assert(p.contains("topkbyagg") || p.contains("TopKByAgg") ||
      p.contains("ObjectHashAggregate"), p.take(2000))
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!reads.contains("lang") && !reads.contains("source"), reads)
  }

  test("RM3: no cartesian; windows only over the bounded expansion frame") {
    // the only Window allowed is the top-e term pick over the frame
    // bounded by m feedback-doc vocabularies per query — every Window
    // must partition by query_id (never a global or corpus-keyed sort)
    val p = plan("q_rm3_topk")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    p.linesIterator.filter(_.matches(".*\\bWindow \\[.*")).foreach { l =>
      assert(l.contains("query_id"), s"window not query-bounded: $l")
    }
  }

  test("hybrid RRF: no cartesian/nested-loop beyond the broadcast query side; window-free") {
    // the only nested-loops allowed are the two audited FIXED-SIZE
    // broadcast sides: the brute-force cosine stage's 8-anchor query
    // frame (the q_cosine_topk shape) and BM25's 1-row corpus-stats fold
    // — never a corpus-sized side; the fusion itself is union + hash
    // aggregate + heap rank
    val p = plan("q_hybrid_rrf")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.linesIterator.exists(_.matches(".*\\bWindow \\[.*")), p.take(2000))
    val bnl = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnl <= 2, s"$bnl nested-loop joins:\n${p.take(2000)}")
  }

  test("kNN graph (exact + IVF): window-free, heap ranks, no cartesian; IVF joins on cell") {
    // exact path: block-pair equi-join + bounded heap — the n² compare
    // work is spread, never materialized through a window or cartesian
    val pe = plan("q_knn_join")
    assert(!pe.contains("CartesianProduct"), pe.take(2000))
    assert(!pe.linesIterator.exists(_.matches(".*\\bWindow \\[.*")), pe.take(2000))
    // IVF path: probe assignment is a bounded-heap aggregate (the
    // corpus-sized twin of probeCells — a window here would shuffle the
    // nCells-amplified corpus), candidates a cell equi-join; only the
    // 16-row centroid frame may ride a broadcast nested loop
    val pi = plan("q_knn_join_ivf")
    assert(!pi.contains("CartesianProduct"), pi.take(2000))
    assert(!pi.linesIterator.exists(_.matches(".*\\bWindow \\[.*")), pi.take(2000))
    // both heap stages surface as ObjectHashAggregate over topk*agg
    assert(pi.toLowerCase.contains("topkbyagg") ||
           pi.toLowerCase.contains("topkpaybyagg"), pi.take(2000))
  }

  test("KMV sketches: constant-size set partials, window-free; weighted sample is TakeOrdered") {
    // kmv_sketch runs as ObjectHashAggregate with a partial stage — the
    // exchange carries one ≤k-element set per (group, partition), never
    // the distinct-key stream a count(distinct) would shuffle
    val p = plan("q_kmv_distinct")
    assert(p.toLowerCase.contains("kmvagg"), p.take(2000))
    assert(p.contains("partial_"), p.take(2000))
    assert(!p.linesIterator.exists(_.matches(".*\\bWindow \\[.*")), p.take(2000))
    // the weighted sample's rank is a distributed TakeOrdered (heap per
    // partition), never a global sort of the full priority frame
    val pw = plan("q_weighted_sample")
    assert(pw.contains("TakeOrderedAndProject"), pw.take(2000))
    assert(!pw.linesIterator.exists(_.matches(".*\\bWindow \\[.*")), pw.take(2000))
  }

  test("skip-scan aggregates only the pruned file subset; compaction plan is metadata-scale") {
    // q_skip_scan ends in a partial→final hash aggregate over the pruned
    // read — no window, no join (the index probe happened at planning
    // time, exactly like the IVF index's cell collect)
    val p = plan("q_skip_scan")
    assert(!p.linesIterator.exists(_.matches(".*\\bWindow \\[.*")), p.take(2000))
    assert(p.contains("HashAggregate"), p.take(2000))
    // the compaction planner's one unpartitioned window runs over the
    // per-(event_type, day) MANIFEST — an aggregate output, never raw rows
    val pc = plan("q_compaction_plan")
    val aggBeforeWindow = pc.linesIterator
      .dropWhile(l => !l.matches(".*\\bWindow \\[.*"))
      .exists(_.contains("HashAggregate"))
    assert(aggBeforeWindow, s"window not fed by the aggregated manifest:\n${pc.take(2000)}")
  }

  test("DQ audit: whole rule set costs one conditional-aggregate pass " +
       "+ one hash-keyed dup pass — never a scan per rule") {
    val p = plan("q_dq_audit")
    // 4 of the 5 rules fold into ONE scan's conditional aggregates; the
    // uniqueness rule is the only second scan (hash-keyed groupBy)
    val scans = p.linesIterator.count(l =>
      l.contains("Scan parquet") || l.contains("FileScan parquet"))
    assert(scans == 2, s"expected 2 scans (one-pass rules + dup rule), got $scans:\n${p.take(2000)}")
    assert(!p.linesIterator.exists(_.matches(".*\\bWindow \\[.*")), p.take(2000))
  }

  test("PIT lookup: broadcast left-outer hash join; fact side never shuffles") {
    val p = plan("q_pit_join")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftOuter"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    // shuffles: the SCD2 window build on the (small) dim side + the output
    // range sort — the 60k-row fact side reaches both joins broadcast-fed
    val shuffles = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(shuffles <= 2, s"unexpected fact-side shuffle ($shuffles exchanges):\n${p.take(2000)}")
  }

  test("heavy hitters: candidate InSet row filter on the scan, no per-key shuffle") {
    val p = plan("q_heavy_hitters")
    // pass 2's candidate membership is a scan-side filter literal
    // (In/InSet over ≤k keys), not a join
    assert(p.toLowerCase.contains("inset") || p.contains(" IN ("), p.take(2000))
    assert(!p.contains("Join"), s"candidate filter became a join:\n${p.take(2000)}")
    assert(!p.linesIterator.exists(_.matches(".*\\bWindow \\[.*")), p.take(2000))
    // one agg exchange (≤k groups) + the output sort; the full word
    // stream never shuffles
    val shuffles = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(shuffles <= 2, s"per-key shuffle leaked ($shuffles exchanges):\n${p.take(2000)}")
  }

  test("fuzzy linkage: equi-join on the block key only — never a " +
      "cartesian; the Levenshtein verify runs post-join, map-side") {
    val p = plan("q_fuzzy_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // the DP verify is a filter/projection over the joined pairs, not a
    // join condition that would force a nested-loop plan
    assert(p.contains("levenshtein"), p.take(2000))
  }

  test("pageRank: per-round lineage is truncated — the 3-round plan is " +
      "a scan of the checkpointed round, not 3 nested joins") {
    val df = SparkEntry.queries("q_pagerank")(spark, TestSpark.Sf0001)
    val p = df.queryExecution.executedPlan.toString
    // localCheckpoint(true) per round: the final plan reads the round-3
    // RDD and sorts — if lineage leaked, 3 rounds × (join + agg) would
    // appear here and grow per iteration
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD") ||
      p.contains("ExistingRDD"), p.take(2000))
    assert(!p.contains("Join"), s"iteration lineage leaked into the final plan:\n${p.take(2000)}")
  }

  test("exceedance levels: one rank window per band partition + the " +
      "final agg — no per-frame shuffle beyond them") {
    val p = plan("q_audio_exceedance")
    val windows = p.linesIterator.count(_.contains("Window ["))
    assert(windows >= 1, p.take(2000))
    // band-partitioned exchanges only: rank window + count window share
    // the band hash partitioning, then one agg on band
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("dynamic partition pruning fires on a day-partitioned fact ⋈ filtered dim") {
    // the 100 TB layout: fact partitioned by day on disk, dimension
    // filtered at runtime — the scan must receive a DYNAMIC partition
    // filter from the dim side (Spark's DPP), reading only the joined
    // days' directories instead of the whole archive. This is the
    // partition-pruning twin of the static window pins above.
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val ev = graft.tables.Tables.events(spark, TestSpark.Sf0001)
      .withColumn("day", to_date(col("ts")))
    ev.write.partitionBy("day").parquet(s"$tmp/fact")
    ev.select(col("day"), dayofmonth(col("day")).as("dom")).distinct()
      .write.parquet(s"$tmp/dim")
    val fact = spark.read.parquet(s"$tmp/fact")
    val dim = spark.read.parquet(s"$tmp/dim").filter(col("dom") <= 3)
    val q = fact.join(dim, "day").agg(count(lit(1)).as("n"))
    val p = q.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      p.linesIterator.take(30).mkString("\n"))
    // and the pruned result is the plain filtered count
    val expected = ev.filter(dayofmonth(col("day")) <= 3).count()
    assert(q.collect().head.getLong(0) == expected)
  }

  test("binned interval join stays an equi-join on the day bin — never " +
      "a nested-loop/cartesian theta join (q_range_join_binned)") {
    // a non-equi time-range join is exactly where Spark falls back to
    // BroadcastNestedLoopJoin (broadcasting a FACT side) — the bin
    // decomposition must keep the residual range predicate inside a
    // keyed join at every scale
    val p = plan("q_range_join_binned")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("CartesianProduct"))
    // the residual trim rides the keyed join's condition (or a
    // post-join filter), with the bin as the equi-key
    assert(p.contains("Join") && p.contains("__bin"),
      p.linesIterator.take(30).mkString("\n"))
  }

  test("scale-safe range-join twin PRE-AGGREGATES the probe side below " +
      "the interval join (q_range_join_agg, r14 verdict #5): the hour-" +
      "grain aggregate must sit under the bin join so the quadratic " +
      "pair set is never materialized") {
    val p = plan("q_range_join_agg")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Join") && p.contains("__bin"))
    // plan reads bottom-up in the string: the probe-side hour aggregate
    // (keyed by l_hour) must appear BELOW (after, in toString order) the
    // bin join it feeds — i.e. the join consumes aggregated rows, not
    // raw lineitems
    val joinAt = p.indexOf("Join")
    val hourAggAt = p.indexOf("l_hour")
    assert(hourAggAt > joinAt,
      "expected the l_hour pre-aggregate beneath the bin join:\n" +
        p.linesIterator.take(40).mkString("\n"))
  }

  test("attribution windows partition by user, never globally; no " +
      "cartesian (q_attribution)") {
    val p = plan("q_attribution")
    val windows = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty, "expected a window node")
    assert(windows.forall(_.contains("user_id")),
      windows.mkString("\n")) // per-user frame — state bounded by a
                              // user's history at any corpus size
    assert(!p.contains("CartesianProduct"))
  }

  test("association rules: item-count joins broadcast; the pair join " +
      "stays a keyed equi-join (q_assoc_rules)") {
    val p = plan("q_assoc_rules")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      p.linesIterator.take(40).mkString("\n"))
    assert(!p.contains("CartesianProduct"))
  }

  test("rank statistics: windows partition by the class column, the " +
      "rank table is the aggregated histogram (q_gini)") {
    val p = plan("q_gini")
    val windows = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("priority")),
      windows.mkString("\n")) // per-class mid-rank windows, not global
    // the cumulative window runs over the (priority, v) HISTOGRAM — an
    // aggregate must sit between the scan and the window
    assert(p.contains("HashAggregate"), p.linesIterator.take(30).mkString("\n"))
  }

  test("label propagation: per-round lineage truncated (scan of the " +
      "checkpointed round, like pageRank); the round kernel's window is " +
      "per-node, never global (q_communities)") {
    // the contract query's final plan must be a scan of round 3's
    // localCheckpoint — NOT three nested join+window rounds
    val p = plan("q_communities")
    assert(p.contains("Scan ExistingRDD"), p.linesIterator.take(20).mkString("\n"))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
    // and one UN-checkpointed round's kernel shows the bounded window:
    // row_number partitioned by node over the neighbour-label counts
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val labels = edges.select(col("src").as("node"), col("src").as("label"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("node")).orderBy(col("c").desc, col("label"))
    val round = edges.join(labels.withColumnRenamed("node", "n2"),
        edges("dst") === col("n2"))
      .select(edges("src").as("node"), col("label"))
      .groupBy(col("node"), col("label")).agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val kp = round.queryExecution.executedPlan.toString
    val windows = kp.linesIterator.filter(_.contains("row_number")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("node")),
      kp.linesIterator.take(25).mkString("\n"))
  }
}
