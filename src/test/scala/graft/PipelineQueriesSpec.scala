package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavior specs for the decontamination-stage queries (PII scrub,
  * benchmark contamination, source-mixture downsampling) on planted inputs
  * — the driver oracle checks them on the real tables, where the synthetic
  * corpus contains no PII; these pin the interesting cases. */
class PipelineQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sequence packing: hand-computed concat-then-chunk layout") {
    // one shard, capacity 128: docs of 100/100/60 tokens concatenate to
    // offsets 0, 100, 200 — doc 1 spans the seq-0/seq-1 cut, doc 2 starts
    // mid-seq-1 and fits
    def words(n: Int) = (0 until n).map(i => s"w$i").mkString(" ")
    val df = Seq((0L, words(100)), (8L, words(100)), (16L, words(60)))
      .toDF("doc_id", "text")
    val r = graft.text.TextOps.packSequences(df, "doc_id", "text",
        capacity = 128, nShards = 1)
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getInt(2), x.getLong(3),
        x.getLong(4), x.getLong(5)))
    assert(r.toSeq == Seq(
      (0L, 100, 0L, 0L, 0L),     // fills [0,100) of seq 0
      (8L, 100, 0L, 100L, 1L),   // [100,200): crosses into seq 1 at 128
      (16L, 60, 1L, 72L, 2L)))   // starts at 200 = seq1+72, ends at 259 → seq 2
  }

  test("chunk overlap: count/length invariants against n_chars, md5 pins " +
      "content, consecutive chunks overlap by size-step chars") {
    val res = graft.SparkEntry.queries("q_chunk_overlap")(
      spark, TestSpark.Sf0001).collect()
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySrc = res.groupBy(_.getLong(0))
    assert(bySrc.keySet == docs.keySet, "every doc chunks")
    bySrc.foreach { case (id, rows) =>
      val n = docs(id).length
      // starts: multiples of 150 below max(1, n) — ceil division count
      assert(rows.length == math.max(1, (math.max(1, n) + 149) / 150),
        s"doc $id chunk count for n_chars=$n")
      rows.foreach { r =>
        val start = r.getInt(2)
        assert(start % 150 == 0 && r.getInt(1) == start / 150)
        assert(r.getInt(3) == math.min(200, n - start),
          s"doc $id chunk at $start length")
      }
    }
    // content pin: recompute md5 for one multi-chunk doc and check the
    // definitional size-step overlap between consecutive chunks
    val id = bySrc.collect { case (k, v) if v.length >= 3 => k }.min
    val text = docs(id)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    bySrc(id).foreach { r =>
      val chunk = text.substring(r.getInt(2),
        math.min(text.length, r.getInt(2) + 200))
      assert(r.getString(4) == md5hex(chunk), s"doc $id md5 at ${r.getInt(2)}")
    }
    val c0 = text.substring(0, 200)
    val c1 = text.substring(150, math.min(text.length, 350))
    assert(c0.substring(150) == c1.substring(0, 50), "50-char overlap")
  }

  test("mix weights: √-temperature flattens toward the pivot, epochs bracket 1") {
    val r = graft.SparkEntry.queries("q_mix_weights")(spark, TestSpark.Sf0001)
      .collect().map(x => (x.getString(0), x.getLong(2), x.getDouble(3),
        x.getDouble(4), x.getDouble(5)))
    assert(r.length >= 2)
    // both weight columns are distributions
    assert(math.abs(r.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(r.map(_._4).sum - 1.0) < 1e-4)
    // eff_epochs = w/p and is ANTITONE in source size: smaller sources get
    // replayed more under the √ temperature
    r.foreach { case (_, _, p, w, e) =>
      assert(math.abs(e - w / p) < 1e-3) }
    val bySize = r.sortBy(_._2)
    assert(bySize.map(_._5).sliding(2).forall(x => x.head >= x.last - 1e-9),
      s"eff_epochs must not increase with n_tokens: ${bySize.toSeq}")
    // Σ p·(w/p) = Σ w = 1 → the p-weighted mean epoch is 1, so the
    // extremes bracket it (strictly, unless all sources are equal-sized)
    assert(bySize.head._5 >= 1.0 - 1e-6 && bySize.last._5 <= 1.0 + 1e-6)
  }

  test("bigram log-prob: hand-computed conditional probabilities") {
    // corpus bigrams: "a b" (doc 0), "b c" (doc 0), "a c" (doc 1)
    // prefix counts: a·=2, b·=1 → P(b|a)=1/2, P(c|b)=1, P(c|a)=1/2
    val df = Seq((0L, "a b c"), (1L, "a c"), (2L, "solo"))
      .toDF("doc_id", "text")
    val r = graft.text.TextOps.bigramLogprob(df, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    def r6(v: Double) = math.round(v * 1e6) / 1e6
    assert(r.toSeq == Seq(
      (0L, 2L, r6(math.log(2) / 2)),  // avg(-ln(1/2), -ln(1)) = ln(2)/2
      (1L, 1L, r6(math.log(2)))))     // single-token doc 2: no bigrams → absent
  }

  test("sequence packing invariants on the real corpus: offsets bounded, shards independent") {
    val docs = graft.tables.Tables.documents(spark, TestSpark.Sf0001)
    val r = graft.text.TextOps.packSequences(docs, "doc_id", "text", 2048, 8)
    val rows = r.collect()
    assert(rows.nonEmpty)
    rows.foreach { x =>
      val (shard, n, s0, off, s1) =
        (x.getInt(1), x.getInt(2), x.getLong(3), x.getLong(4), x.getLong(5))
      assert(off >= 0 && off < 2048)
      assert(s0 >> 40 == shard && s1 >> 40 == shard) // ids shard-scoped
      assert(s1 >= s0) // holds for zero-token docs too (seq_end clamps)
      // a doc that fits in the remaining room must not span
      if (n > 0 && off + n <= 2048) assert(s0 == s1)
    }
  }

  test("training export: one sorted file per shard, shard-complete, stable order") {
    val docs = graft.tables.Tables.documents(spark, TestSpark.Sf0001)
    val root = java.nio.file.Files.createTempDirectory("graft_export").toString
    graft.sources.TrainingExport.exportShards(docs, root, "doc_id", 4)
    val dirs = new java.io.File(root).listFiles().filter(_.getName.startsWith("shard="))
    assert(dirs.map(_.getName).sorted.toSeq ==
      (0 until 4).map(i => s"shard=$i"))
    dirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1)
    }
    val back = spark.read.parquet(root)
    assert(back.count() == docs.count())
    // each shard holds exactly its residue class, sorted within the file
    (0 until 4).foreach { k =>
      val ids = spark.read.parquet(s"$root/shard=$k")
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted)
      assert(ids.forall(_ % 4 == k))
    }
    assert((0 until 4).map(k => spark.read.parquet(s"$root/shard=$k").count()).sum
      == docs.count())
  }

  test("end-to-end pipeline main: clean -> pack -> export, counts consistent") {
    val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val n = PipelineMain.run(spark, TestSpark.Sf0001, out, nShards = 4,
      capacity = 1024)
    val expected = SparkEntry.queries("q_corpus_clean")(spark, TestSpark.Sf0001).count()
    assert(n == expected && n > 0)
    val back = spark.read.parquet(out)
    // every exported row carries text + packing layout, shard-complete
    assert(Seq("doc_id", "text", "seq_start", "seq_offset", "seq_end")
      .forall(back.columns.contains))
    assert(back.select("doc_id").distinct().count() == n)
  }

  test("PII scrub redacts planted emails and URLs, counts them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pii").toString
    Seq(
      (1L, "contact alice@example.com or bob.smith+tag@sub.domain.org today", "en", "src0", 50L),
      (2L, "see https://example.com/path?q=1 and http://a.b/c for details", "en", "src1", 50L),
      (3L, "no pii here at all", "en", "src0", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q_pii_scrub")(spark, dir)
      .collect().map(row => row.getLong(0) -> (row.getInt(1), row.getInt(2))).toMap
    assert(r(1L) == ((2, 0)))
    assert(r(2L) == ((0, 2)))
    assert(r(3L) == ((0, 0)))
    // the redaction is effective: scrubbed text of doc 1 no longer matches
    val scrubbed = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"doc_id" === 1L)
      .select(regexp_replace(col("text"),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"))
      .head().getString(0)
    assert(scrubbed == "contact [EMAIL] or [EMAIL] today")
  }

  test("contamination flags eval-set members and near-copies, not clean docs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_contam").toString
    Seq(
      (100L, "the quick brown fox jumps over the lazy dog", "en", "src0", 44L), // eval (id%100==0)
      (101L, "the quick brown fox jumps over the lazy dog", "en", "src1", 44L), // full copy
      (102L, "a completely different document about spark plans", "en", "src2", 49L),
      (103L, "the quick brown fox jumps over something else entirely today " +
        "with many extra unrelated words pushing shared shingles well below half",
        "en", "src3", 132L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q_contamination")(spark, dir)
      .collect().map(row => row.getLong(0) -> row.getInt(3)).toMap
    assert(r(100L) == 1) // eval doc overlaps itself fully
    assert(r(101L) == 1) // verbatim benchmark copy caught
    assert(r(102L) == 0)
    assert(r(103L) == 0) // shares a prefix but under the 50% bar
  }

  test("source mixture: deterministic, rates track the per-source targets") {
    val r = SparkEntry.queries("q_source_mixture")(spark, TestSpark.Sf0001)
      .collect().map(row => (row.getString(0), row.getLong(1), row.getLong(2)))
    assert(r.nonEmpty)
    val again = SparkEntry.queries("q_source_mixture")(spark, TestSpark.Sf0001)
      .collect().map(row => (row.getString(0), row.getLong(1), row.getLong(2)))
    assert(r.toSeq == again.toSeq) // hash coin, not rand(): identical reruns
    r.foreach { case (src, total, kept) =>
      assert(kept <= total)
      val even = src.filter(_.isDigit).toInt % 2 == 0
      // c0/256 = 75% target for even sources, 40/256 = 25% for odd; with 25
      // docs per source allow wide but directionally-separating bounds
      if (even) assert(kept.toDouble / total > 0.4, s"$src kept $kept/$total")
      else assert(kept.toDouble / total < 0.6, s"$src kept $kept/$total")
    }
  }

  test("epoch shuffle: a deterministic sharded permutation of the corpus") {
    val dir = TestSpark.Sf0001
    val rows = SparkEntry.queries("q_epoch_shuffle")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val n = graft.tables.Tables.documents(spark, dir).count()
    assert(rows.length == n)                      // every doc placed once
    assert(rows.map(_._1).distinct.length == n)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(shard >= 0 && shard < 8)
      // positions within a shard are exactly 1..count — a permutation
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length).toSeq, s"shard $shard")
    }
    // deterministic: identical rerun, and position uncorrelated with id
    // order (the corpus is id-sorted on disk; a shuffle that preserved id
    // order within a shard would be broken)
    val again = SparkEntry.queries("q_epoch_shuffle")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.toSeq == again.toSeq)
    val biggestShard = rows.groupBy(_._2).values.maxBy(_.length)
    val inIdOrder = biggestShard.sortBy(_._1).map(_._3).toSeq
    assert(inIdOrder != inIdOrder.sorted, "shuffle preserved ingest order")
  }

  test("chunk windows: hand-computed overlapping layout") {
    def words(n: Int) = (0 until n).map(i => s"w$i").mkString(" ")
    val df = Seq((0L, words(10)), (1L, words(33)), (2L, words(99)),
        (3L, ""), (4L, "   ")) // empty/whitespace docs yield NO chunks
      .toDF("doc_id", "text")
    val r = graft.text.TextOps.chunkWindows(df, "doc_id", "text", 32, 24)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getInt(3)))
    assert(r.toSeq == Seq(
      (0L, 0, 0, 10),                                    // short doc: 1 chunk
      (1L, 0, 0, 32), (1L, 1, 24, 9),                    // 33 tokens: 2 chunks
      (2L, 0, 0, 32), (2L, 1, 24, 32), (2L, 2, 48, 32), (2L, 3, 72, 27)))
    // coverage invariant: the last chunk ends exactly at n, earlier chunks
    // are full windows
    r.groupBy(_._1).foreach { case (_, cs) =>
      val last = cs.maxBy(_._2)
      cs.filter(_ != last).foreach(c => assert(c._4 == 32))
      assert(last._3 + last._4 == cs.map(c => c._3 + c._4).max)
    }
  }

  test("negative sampling: deterministic, excludes the anchor, dense ranks") {
    val dir = TestSpark.Sf0001
    val r = SparkEntry.queries("q_neg_sample")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getLong(3)))
    assert(r.nonEmpty)
    val again = SparkEntry.queries("q_neg_sample")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == again.toSeq)
    r.groupBy(_._1).foreach { case (anchor, ns) =>
      assert(ns.map(_._2).sorted.toSeq == (1 to ns.length), s"anchor $anchor")
      assert(ns.forall(_._3 != anchor))
      // negatives are hv-ordered (the "random draw" is the hash order)
      assert(ns.sortBy(_._2).map(_._4).sliding(2).forall(s =>
        s.length < 2 || s.head <= s.last))
    }
    // different anchors draw different negatives (independent permutations)
    val negSets = r.groupBy(_._1).values.map(_.map(_._3).toSet).toSeq
    assert(negSets.distinct.size > 1)
  }

  test("drift terms: hand-computed KL contributions on a planted corpus") {
    // source A: 10× "apple", 10× "the"; source B: 10× "banana", 10× "the".
    // "the" is distribution-neutral (p_s = p_corpus → contrib 0); the
    // source-exclusive terms carry the drift: p_s = 1/2, p_corpus = 1/4 →
    // contrib = 0.5·ln(2)
    def rep(w: String) = Seq.fill(10)(w).mkString(" ")
    val df = Seq(("A", s"${rep("apple")} ${rep("the")}"),
                 ("B", s"${rep("banana")} ${rep("the")}"))
      .toDF("source", "text")
    val r = graft.text.TextOps.driftTerms(df, "source", "text", 5, 5)
      .orderBy("source", "rank")
      .collect().map(x => (x.getString(0), x.getInt(1), x.getString(2),
        x.getLong(3), x.getDouble(4)))
    def r6(v: Double) = math.round(v * 1e6) / 1e6
    val drift = r6(0.5 * math.log(2.0))
    assert(r.toSeq == Seq(
      ("A", 1, "apple", 10L, drift), ("A", 2, "the", 10L, 0.0),
      ("B", 1, "banana", 10L, drift), ("B", 2, "the", 10L, 0.0)))
  }

  test("drift terms on the real corpus: noise floor holds, top term positive") {
    val r = SparkEntry.queries("q_drift_terms")(spark, TestSpark.Sf0001)
      .collect().map(x => (x.getString(0), x.getInt(1), x.getLong(3), x.getDouble(4)))
    assert(r.nonEmpty)
    assert(r.forall(_._3 >= 5)) // minCount floor
    r.groupBy(_._1).foreach { case (src, rows) =>
      // an overrepresented term always exists → rank-1 contribution > 0
      assert(rows.minBy(_._2)._4 > 0, s"$src")
    }
  }

  test("winnow overlap: planted shared run pairs up; ubiquitous boilerplate doesn't") {
    // docs 0 and 1 share a long verbatim run (> w+k-1 tokens → multiple
    // shared fingerprints); every doc carries the same boilerplate tail,
    // whose fingerprints exceed the df cap and must not create pairs
    val run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val boiler = "terms of service apply to all content here"
    val docs = Seq(
      (0L, s"$run unique0 $boiler"),
      (1L, s"$run unique1 $boiler")) ++
      (2L to 9L).map(i => (i, s"doc$i body text number $i $boiler"))
    val df = docs.toDF("doc_id", "text")
    val pairs = graft.text.TextOps.winnowOverlap(df, "doc_id", "text",
        k = 3, w = 4, maxDf = 5, minShared = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L)),
      s"only the planted pair should survive: ${pairs.toSeq}")
    assert(pairs.head._3 >= 3)
  }

  test("substring dedup: one token scheme end to end (RE2 vs Java \\x0B edge)") {
    //  is INSIDE a token for the kernel/RE2 scheme but whitespace
    // for Java's \S+ — count, spans, and application must all use the
    // kernel scheme or spans mis-index on such corpora
    val df = Seq((0L, "aabb cc dd"), (1L, "ee ff gg hh"))
      .toDF("doc_id", "text")
    val spans = graft.text.TextOps.substrDedupSpans(df, "doc_id", "text",
        minRun = 2).orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getString(3)))
    // no duplicated runs: one full keep span per doc; doc 0 has THREE
    // kernel tokens (aabb, cc, dd), so its span ends at 2, not 3
    assert(spans.toSeq == Seq((0L, 0, 2, "keep"), (1L, 0, 3, "keep")))
    val clean = graft.text.TextOps.substrDedupApply(df, "doc_id", "text",
        minRun = 2).orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getString(1)))
    assert(clean.toSeq == Seq((0L, "aabb cc dd"), (1L, "ee ff gg hh")))
  }

  test("Gopher rules: planted docs pass or fail the intended rule") {
    val passText = (Seq("the", "value", "with", "data") ++
      (1 to 56).map(i => s"word$i")).mkString(" ") // 60 words, 2 stop terms
    val shortText = "the data with value" // fails the >= 50 word bound
    val numText = (Seq("the", "with") ++
      (1 to 58).map(_.toString)).mkString(" ") // alpha frac 2/60 < 0.8
    val noStop = (1 to 60).map(i => s"word$i").mkString(" ") // 0 stop terms
    val df = Seq((0L, passText), (1L, shortText), (2L, numText),
      (3L, noStop)).toDF("doc_id", "text")
    val r = graft.text.TextOps.gopherRules(df, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getInt(8)))
    assert(r.toSeq == Seq((0L, 60, 1), (1L, 4, 0), (2L, 60, 0), (3L, 60, 0)))
  }

  test("substring dedup: planted verbatim run recovered to exact token extents") {
    // docs 0 and 1 share a verbatim 12-token run (> minRun=10) at
    // different offsets — BOTH copies must become drop spans covering
    // exactly the run's token extent; doc 2 is unique (one full keep
    // span); doc 3 repeats a 10-token run within itself back-to-back —
    // the adjacent extents merge into one whole-document drop span
    val run = (1 to 12).map(i => s"r$i").mkString(" ")
    val run2 = (1 to 10).map(i => s"a$i").mkString(" ")
    val df = Seq(
      (0L, s"u1 u2 u3 u4 u5 $run s1 s2 s3 s4 s5"),
      (1L, s"$run t1 t2 t3 t4 t5 t6 t7 t8"),
      (2L, (1 to 15).map(i => s"c$i").mkString(" ")),
      (3L, s"$run2 $run2")).toDF("doc_id", "text")
    val r = graft.text.TextOps.substrDedupSpans(df, "doc_id", "text",
        minRun = 10)
      .orderBy("doc_id", "span_start")
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getString(3)))
    assert(r.toSeq == Seq(
      (0L, 0, 4, "keep"), (0L, 5, 16, "drop"), (0L, 17, 21, "keep"),
      (1L, 0, 11, "drop"), (1L, 12, 19, "keep"),
      (2L, 0, 14, "keep"),
      (3L, 0, 19, "drop")))

    // keep-one-copy variant: the canonical (earliest packed doc,pos)
    // occurrence survives — doc 0 keeps its run untouched, doc 1 still
    // drops; doc 3's first within-doc copy survives, the repeat drops
    val k1 = graft.text.TextOps.substrDedupSpans(df, "doc_id", "text",
        minRun = 10, keepFirst = true)
      .orderBy("doc_id", "span_start")
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getString(3)))
    assert(k1.toSeq == Seq(
      (0L, 0, 21, "keep"),
      (1L, 0, 11, "drop"), (1L, 12, 19, "keep"),
      (2L, 0, 14, "keep"),
      (3L, 0, 9, "keep"), (3L, 10, 19, "drop")))

    // spans applied: drop-span tokens removed, keep tokens re-joined;
    // the fully-duplicated doc 3 comes back empty
    val clean = graft.text.TextOps.substrDedupApply(df, "doc_id", "text",
        minRun = 10)
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getString(1)))
    assert(clean.toSeq == Seq(
      (0L, "u1 u2 u3 u4 u5 s1 s2 s3 s4 s5"),
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8"),
      (2L, (1 to 15).map(i => s"c$i").mkString(" ")),
      (3L, "")))
  }

  test("DSIR weights: planted target vocabulary separates, neutral terms don't") {
    // target docs (src0) speak "apple", raw-only docs speak "zebra", and
    // "the" is common to both. A target-vocab doc must outscore a
    // raw-vocab doc; the shared-vocab doc sits between them.
    def rep(w: String) = Seq.fill(20)(w).mkString(" ")
    val df = Seq(
      (0L, "src0", s"${rep("apple")} ${rep("the")}"),
      (1L, "src0", s"${rep("apple")} ${rep("the")}"),
      (2L, "srcX", s"${rep("zebra")} ${rep("the")}"),
      (3L, "srcX", s"${rep("zebra")} ${rep("the")}"),
      (4L, "srcX", rep("the"))).toDF("doc_id", "source", "text")
    val w = graft.text.TextOps.dsirLogWeights(df, "doc_id", "text",
        col("source") === "src0", buckets = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(w(0L) == w(1L)) // identical docs, identical weight
    assert(w(0L) > w(4L), s"target-vocab ${w(0L)} vs shared-vocab ${w(4L)}")
    assert(w(4L) > w(2L), s"shared-vocab ${w(4L)} vs raw-vocab ${w(2L)}")
    assert(w(2L) == w(3L))
  }

  test("DSIR weights on the real corpus: target sources average higher") {
    import org.apache.spark.sql.functions.col
    val docs = graft.tables.Tables.documents(spark, TestSpark.Sf0001)
    val scored = SparkEntry.queries("q_dsir_weights")(spark, TestSpark.Sf0001)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Double]("log_weight")))
    val (target, rest) = scored.partition(s => s._1 == "src0" || s._1 == "src1")
    assert(target.nonEmpty && rest.nonEmpty)
    val tAvg = target.map(_._2).sum / target.length
    val rAvg = rest.map(_._2).sum / rest.length
    assert(tAvg > rAvg, f"target avg $tAvg%.4f should exceed raw-rest avg $rAvg%.4f")
  }

  test("perplexity buckets: per-source thirds with ordered means") {
    val dir = TestSpark.Sf0001
    val rows = SparkEntry.queries("q_ppl_buckets")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    val scored = SparkEntry.queries("q_bigram_logprob")(spark, dir).count()
    assert(rows.map(_._3).sum == scored) // every scored doc lands in a bucket
    rows.groupBy(_._1).foreach { case (src, bs) =>
      val byBucket = bs.map(b => b._2 -> b).toMap
      assert(byBucket.keySet == Set("head", "middle", "tail"), s"$src")
      // head ≤ b33 < middle ≤ b67 < tail by construction
      assert(byBucket("head")._4 <= byBucket("middle")._4, s"$src")
      assert(byBucket("middle")._4 <= byBucket("tail")._4, s"$src")
      // percentile split: no bucket can dominate (loose thirds)
      val total = bs.map(_._3).sum.toDouble
      bs.foreach(b => assert(b._3 / total < 0.6, s"$src ${b._2} ${b._3}/$total"))
    }
  }

  test("weighted sample: heavy items over-represented vs uniform; keys ascending, ids distinct") {
    import graft.text.TextOps
    val d = graft.tables.Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"),
        when(col("n_chars") >= 500, 3)
          .when(col("n_chars") >= 250, 2).otherwise(1).as("w"))
    val sample = d
      .withColumn("j", explode(sequence(lit(0), col("w") - 1)))
      .select(col("doc_id"), col("w"),
        TextOps.md5Key64(concat_ws(":", col("doc_id"), col("j")), "wrs:").as("hk"))
      .groupBy(col("doc_id"), col("w")).agg(min(col("hk")).as("key"))
      .orderBy("key").limit(200)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(sample.length === 200)
    assert(sample.map(_._1).distinct.length === 200)
    assert(sample.map(_._3).toSeq == sample.map(_._3).sorted.toSeq)
    // the min-of-w-hash priority gives P(pick) ∝ w: the sample's mean
    // weight must exceed the population's (deterministic given the data)
    val popAvg = d.agg(avg(col("w"))).collect()(0).getDouble(0)
    val sampleAvg = sample.map(_._2).sum.toDouble / sample.length
    assert(sampleAvg > popAvg, s"sample avg w $sampleAvg !> population $popAvg")
  }

  test("kAnonymize: under-k groups merge into '*', residual under-k flagged, mass preserved") {
    import spark.implicits._
    // planted: en has one big group + two rare that merge to a k-ok '*';
    // de has a single rare group whose '*' stays under k (k_ok=false)
    val rows =
      Seq.fill(6)(("en", "sA")) ++ Seq(("en", "sB"), ("en", "sB"),
        ("en", "sC"), ("en", "sC"), ("en", "sC")) ++ Seq(("de", "sD"))
    val out = graft.text.TextOps.kAnonymize(
        rows.toDF("lang", "source"), Seq("lang", "source"), "source", k = 5)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getBoolean(3))).toSet
    assert(out === Set(
      ("en", "sA", 6L, true),  // already k-anonymous, name kept
      ("en", "*", 5L, true),   // 2+3 rare rows merge and now satisfy k
      ("de", "*", 1L, false))) // generalization insufficient → suppress
    // no row lost or duplicated by the generalize→regroup
    assert(out.toSeq.map(_._3).sum === rows.size)
  }

  test("Heaps-law curve: monotone growth, final checkpoint equals the " +
      "whole corpus, vocabulary grows sub-linearly in tokens") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_heaps_law")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4,
        s"checkpoint ${b._1} shrank vs ${a._1}")
    }
    val d = graft.tables.Tables.documents(spark, TestSpark.Sf0001)
    val last = rows.last
    assert(last._2 == d.count())
    val vocabAll = d.select(explode(graft.text.TextOps.wsTokens(
        lower(col("text")))).as("t"))
      .agg(countDistinct(col("t"))).head.getLong(0)
    assert(last._4 == vocabAll)
    // Heaps: vocab grows much slower than tokens on this corpus
    assert(last._4 < last._3 / 10)
  }
}
