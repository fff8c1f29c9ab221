package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.DedupOps

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
  private lazy val docs = Seq(
    (0L, base),                       // original
    (1L, base),                       // exact copy of 0
    (2L, base + " extra"),            // near-dup of 0 (one appended token)
    (3L, "totally different words entirely unrelated content here now"),
    (4L, base.replace("alpha", "ALPHA-CHANGED") + " more tokens appended here")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content, keeper = min id") {
    val got = DedupOps.exactDedup(docs, "doc_id", "text")
      .orderBy("keep_id")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.length == 4) // 0+1 merged
    assert(got.head == ((0L, 2L))) // keeper 0, two copies
  }

  test("ngram jaccard finds exact and near dup pairs, not unrelated docs") {
    val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical → jaccard 1.0
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated never pairs
  }

  test("prefix-filtered jaccard equals the naive formulation bit-for-bit") {
    def toSet(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b", "shared", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // planted fixture (near dups + unrelated)
    assert(toSet(DedupOps.ngramJaccardPairsPrefix(docs, "doc_id", "text", 3, 0.8)) ==
      toSet(DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)))
    // real documents table, including at a LOW threshold where the prefix
    // is long and boundary arithmetic (⌈t·n⌉) matters most
    val real = graft.tables.Tables.documents(spark, TestSpark.Sf0001)
    for (t <- Seq(0.5, 0.8)) {
      val naive = toSet(DedupOps.ngramJaccardPairs(real, "doc_id", "text", 3, t))
      val pref = toSet(DedupOps.ngramJaccardPairsPrefix(real, "doc_id", "text", 3, t))
      assert(naive.nonEmpty)
      assert(pref == naive, s"threshold $t: prefix variant diverged")
    }
  }

  test("contract pair-join path bounds posting-list fan-out (prefix index)") {
    // the contract queries (q_dedup_ngram, q_corpus_clean) run the prefix-
    // filtered formulation; this pins the property that makes it the scale
    // path: the candidate index keeps at most n − ⌈t·n⌉ + 1 hashes per doc
    val real = graft.tables.Tables.documents(spark, TestSpark.Sf0001)
    val ex = DedupOps.shingleHashes(real, "doc_id", "text", 3)
    val full = ex.groupBy("doc_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val pref = DedupOps.prefixIndex(ex, 0.8).groupBy("doc_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pref.keySet == full.keySet)
    pref.foreach { case (id, p) =>
      val n = full(id)
      val bound = n - (n * 800 + 999) / 1000 + 1 // n − ⌈0.8n⌉ + 1, integer-exact
      assert(p == math.max(bound, 1L), s"doc $id: prefix $p, expected $bound of $n")
    }
    // aggregate: at t=0.8 the index is ≈20% of the full posting frame, so a
    // stop shingle shared by every doc joins ~25× fewer rows (≈625× fewer
    // candidate pairs) than the naive self-join would
    assert(pref.values.sum <= full.values.sum / 4 + pref.size)
  }

  test("minhash+LSH output matches exact jaccard on the planted pairs") {
    val exact = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.minhashDedupPairs(docs, "doc_id", "text", 3, 128, 32, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact) // verification stage makes precision exact; recall 100% here
  }

  test("minhash+LSH on real documents table: subset of exact, full recall at 0.8") {
    val real = graft.tables.Tables.documents(spark, TestSpark.Sf0001)
    val exact = DedupOps.ngramJaccardPairs(real, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.minhashDedupPairs(real, "doc_id", "text", 3, 128, 32, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(lsh == exact) // 128 hashes / 32 bands: P(miss @0.8) ≈ (1-0.8⁴)¹⁶ ≈ 2e-4
  }

  test("q_dedup_eval: count identities hold, and a 1-band config " +
      "measurably loses the recall the 32-band config keeps") {
    val row = SparkEntry.queries("q_dedup_eval")(spark, TestSpark.Sf0001)
      .collect().head
    val (nT, nP, tp) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val (p, r, f1) = (row.getDouble(3), row.getDouble(4), row.getDouble(5))
    assert(nT > 0 && nP > 0, "degenerate eval corpus")
    assert(tp <= math.min(nT, nP))
    assert(math.abs(p - tp.toDouble / nP) < 1e-6)
    assert(math.abs(r - tp.toDouble / nT) < 1e-6)
    assert(math.abs(f1 - 2.0 * tp / (nP + nT)) < 1e-6)
    // the metric detects imperfect configs: one 128-row band demands a
    // near-exact signature match, so the planted 0.8-Jaccard pairs drop
    // out of the candidate set (P(collide) = j^128 ≈ 0) and recall
    // falls below the 32-band config's
    val real = graft.tables.Tables.documents(spark, TestSpark.Sf0001)
    val sigs = DedupOps.minhashSignatures(real, "doc_id", "text", 3, 128)
    val oneBand = DedupOps.lshCandidates(sigs, 128, 1)
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = DedupOps.ngramJaccardPairsPrefix(real, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tp1 = (oneBand intersect truth).size
    assert(tp1 < truth.size,
      s"1-band recall $tp1/${truth.size} should lose pairs vs 32 bands")
  }

  test("bucket-capped candidates: stars for hot buckets, subset of clique, same clusters on boilerplate") {
    // boilerplate family: 6 exact copies (one bucket of 6 in EVERY band)
    // + the regular planted docs
    val family = (10L until 16L).map(i => (i, base + " boilerplate suffix"))
    val corpus = docs.unionByName(family.toDF("doc_id", "text"))
    val sigs = DedupOps.minhashSignatures(corpus, "doc_id", "text", 3, 128)
      .localCheckpoint(true)
    val clique = DedupOps.lshCandidates(sigs, 128, 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = DedupOps.lshCandidates(sigs, 128, 32, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // star candidates are a subset of the clique's...
    assert(capped.subsetOf(clique))
    // ...the family's clique (15 pairs) collapses to its 5 hub edges...
    val famClique = clique.filter(p => p._1 >= 10L)
    val famCapped = capped.filter(p => p._1 >= 10L)
    assert(famClique.size == 15 && famCapped == (11L to 15L).map((10L, _)).toSet)
    // ...under-cap buckets still emit their pairs (docs 0/1/2 share
    // size-3 buckets in any band where the family's slice differs)...
    assert(Set((0L, 1L), (0L, 2L), (1L, 2L)).subsetOf(capped))
    // ...and the CLUSTERING consumer sees identical components (hub edges
    // of a near-identical family all pass verification)
    def clusters(cands: Set[(Long, Long)]) = {
      val ex = DedupOps.shingleHashes(corpus, "doc_id", "text", 3)
      val verified = DedupOps.verifyJaccardPairs(
        cands.toSeq.toDF("id_a", "id_b"), ex, 0.8)
      DedupOps.duplicateClusters(verified.select("id_a", "id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(clusters(capped) == clusters(clique))
  }

  test("duplicate clusters: transitive closure with min-id labels") {
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L), (8L, 9L), (2L, 3L))
      .toDF("id_a", "id_b")
    val got = DedupOps.duplicateClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // chain 0-1-2-3 collapses to cluster 0 (transitive), 5-6 and 8-9 separate
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      5L -> 5L, 6L -> 5L, 8L -> 8L, 9L -> 8L))
  }

  test("cluster size histogram: planted 4-chain, two pairs, singletons") {
    // ids 0..9; pair graph: chain 0-1-2-3 (size 4), 5-6 and 8-9 (size 2);
    // 4 and 7 never pair → 2 singletons
    val all = (0L until 10L).toDF("doc_id")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L), (8L, 9L), (2L, 3L))
      .toDF("id_a", "id_b")
    val got = DedupOps.clusterSizeHistogram(all, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (4L, 1L)))
    // no singletons → the size-1 row stays, with count 0
    val all2 = Seq(0L, 1L, 2L, 3L, 5L, 6L, 8L, 9L).toDF("doc_id")
    val got2 = DedupOps.clusterSizeHistogram(all2, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got2 == Seq((1L, 0L), (2L, 2L), (4L, 1L)))
  }

  test("duplicate clusters: driver union-find ≡ distributed label propagation") {
    // a long chain (pointer-jumping stress), a star, a 2-cycle-ish pair set
    val es = (0L until 40L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (100L, 102L), (100L, 103L), (200L, 201L), (201L, 200L))
    val pairs = es.toDF("id_a", "id_b")
    val viaDriver = DedupOps.duplicateClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaRounds = DedupOps.duplicateClusters(pairs, driverEdgeCap = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaDriver == viaRounds)
    assert((0L to 40L).forall(viaDriver(_) == 0L))
    assert(viaDriver(103L) == 100L && viaDriver(201L) == 200L)
  }

  test("duplicate clusters: schema is (long, long) on BOTH paths; non-integral ids rejected") {
    // INT ids: both the driver fast path and the distributed rounds must
    // emit LongType (the output schema can't depend on graph size)
    val intPairs = Seq((1, 2), (3, 4)).toDF("id_a", "id_b")
    for (cap <- Seq(2000000L, 0L)) {
      val out = DedupOps.duplicateClusters(intPairs, driverEdgeCap = cap)
      assert(out.schema.fields.map(_.dataType).toSeq ==
        Seq(org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.LongType),
        s"cap=$cap")
      assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toMap ==
        Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    }
    // string ids would cast to NULL silently — the guard must fire
    val e = intercept[IllegalArgumentException] {
      DedupOps.duplicateClusters(Seq(("a", "b")).toDF("id_a", "id_b"))
    }
    assert(e.getMessage.contains("integral"))
  }

  test("group split: no near-dup pair straddles the fold boundary") {
    val d = graft.tables.Tables.documents(spark, TestSpark.Sf0001)
    val out = SparkEntry.queries("q_group_split")(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.size == d.count())
    val pairs = DedupOps.ngramJaccardPairsPrefix(d, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture has no near-dup pairs — test is vacuous")
    pairs.foreach { case (a, b) =>
      assert(out(a) == out(b), s"near-dup pair ($a,$b) split ${out(a)}/${out(b)}")
    }
    // both folds populated (split isn't degenerate)
    assert(out.values.toSet == Set("train", "val"))
  }

  test("fuzzyPairs: hand-computed distances within a block; divergent " +
      "openings never pair; hot blocks capped") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog tonight"
    val df = Seq(
      (0L, base),
      (1L, base.replace("dog", "cat")),   // edit PAST the 24-char block
      (2L, "a completely different opening " + base),
      (3L, base)                          // exact copy, dist 0
    ).toDF("id", "txt")
    val got = DedupOps.fuzzyPairs(df, "id", "txt", blockChars = 24, maxDist = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    // doc 2 diverges inside the 24-char block → never a candidate;
    // "dog"→"cat" is 3 substitutions
    assert(got.keySet == Set((0L, 1L), (0L, 3L), (1L, 3L)),
      s"pairs were ${got.keySet}")
    assert(got((0L, 3L)) == 0)
    assert(got((0L, 1L)) == 3 && got((1L, 3L)) == 3)
    // cap: blockCap=1 makes the shared block hot → no pairs at all
    assert(DedupOps.fuzzyPairs(df, "id", "txt", 24, 10, blockCap = 1).isEmpty)
  }

  test("fuzzyPairs on the corpus: planted near-dup families surface with " +
      "small distances; members corroborate the n-gram pairs") {
    val fuzzy = SparkEntry.queries("q_fuzzy_pairs")(spark, TestSpark.Sf0001)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
    assert(fuzzy.nonEmpty, "no fuzzy pairs at sf0.001 — test is vacuous")
    fuzzy.foreach { case ((a, b), d) =>
      assert(a < b && d >= 0 && d <= 10)
    }
  }

  test("simhash: identical docs share fingerprints; near-dups within hamming 3") {
    val fps = DedupOps.simhash(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fps(0L) == fps(1L))
    val pairs = DedupOps.simhashPairs(DedupOps.simhash(docs, "doc_id", "text"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
