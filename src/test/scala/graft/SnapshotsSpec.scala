package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Snapshots

/** Commit-log time travel ([[graft.sources.Snapshots]]): append/remove
  * commits, immutability of already-committed versions, and the
  * empty-snapshot refusal — the semantics q_time_travel's oracle
  * replays as day-range aggregates. */
class SnapshotsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("append/remove commits: monotone versions, exact per-version " +
      "contents, history survives the purge") {
    import spark.implicits._
    val root =
      java.nio.file.Files.createTempDirectory("graft_snap").toString + "/t"
    assert(Snapshots.currentVersion(spark, root) == -1)

    assert(Snapshots.commitAppend(spark, root, Seq(1, 2, 3).toDF("x")) == 0)
    assert(Snapshots.commitAppend(spark, root, Seq(4, 5).toDF("x")) == 1)
    val purged = Snapshots.manifest(spark, root, 0)
    assert(purged.nonEmpty)
    assert(Snapshots.commitRemove(spark, root, purged) == 2)
    assert(Snapshots.currentVersion(spark, root) == 2)

    def xs(v: Int): Seq[Int] = Snapshots.readSnapshot(spark, root, v)
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(xs(0) == Seq(1, 2, 3))
    assert(xs(1) == Seq(1, 2, 3, 4, 5))
    assert(xs(2) == Seq(4, 5))
    // the purge commit wrote only a new manifest: v0 still reads exact
    assert(xs(0) == Seq(1, 2, 3))
    // plan contract: a snapshot read scans EXACTLY the manifest's files
    def norm(p: String) = new java.net.URI(p).getPath
    assert(Snapshots.readSnapshot(spark, root, 1).inputFiles
      .map(norm).toSet ==
      Snapshots.manifest(spark, root, 1).map(norm).toSet)

    // removing everything leaves a snapshot with no files — reading it
    // refuses loudly rather than inferring a schema from nothing
    val v3 = Snapshots.commitRemove(spark, root,
      Snapshots.manifest(spark, root, 2))
    intercept[IllegalArgumentException] {
      Snapshots.readSnapshot(spark, root, v3)
    }
  }

  test("commitAppendOnce: a re-delivered token returns the same " +
      "version and appends nothing") {
    import spark.implicits._
    val root =
      java.nio.file.Files.createTempDirectory("graft_once").toString + "/t"
    val v0 = Snapshots.commitAppendOnce(spark, root,
      Seq(1, 2).toDF("x"), "s1-0")
    assert(v0 == 0)
    // the at-least-once replay: same token, same (or any) payload
    val again = Snapshots.commitAppendOnce(spark, root,
      Seq(1, 2).toDF("x"), "s1-0")
    assert(again == 0)
    assert(Snapshots.currentVersion(spark, root) == 0)
    assert(Snapshots.readSnapshot(spark, root, 0)
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    // a NEW token is a real second commit
    assert(Snapshots.commitAppendOnce(spark, root,
      Seq(3).toDF("x"), "s1-1") == 1)
    assert(Snapshots.readSnapshot(spark, root, 1)
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
  }

  test("commitReplace: compaction rewrites the state into fewer files " +
      "while historical versions keep their own layout") {
    import spark.implicits._
    val root =
      java.nio.file.Files.createTempDirectory("graft_rep").toString + "/t"
    Snapshots.commitAppend(spark, root,
      Seq(1, 2, 3).toDF("x").repartition(3))                  // v0: 3 files
    Snapshots.commitAppend(spark, root,
      Seq(4, 5).toDF("x").repartition(2))                     // v1: +2 files
    assert(Snapshots.manifest(spark, root, 1).length == 5)
    val v2 = Snapshots.commitReplace(spark, root,
      Snapshots.readSnapshot(spark, root, 1).coalesce(1))     // compact
    assert(v2 == 2)
    assert(Snapshots.manifest(spark, root, 2).length == 1)
    def xs(v: Int): Seq[Int] = Snapshots.readSnapshot(spark, root, v)
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(xs(2) == Seq(1, 2, 3, 4, 5))   // content identical
    assert(xs(1) == Seq(1, 2, 3, 4, 5))   // pre-compaction version intact
    assert(xs(0) == Seq(1, 2, 3))
    // and the history table sees the layout change, footer-only
    val h = Snapshots.history(spark, root).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(h.toSeq == Seq((0, 3L, 3L), (1, 5L, 5L), (2, 1L, 5L)))
  }

  test("eraseAcrossHistory: doomed keys vanish from EVERY version; " +
      "clean files stay shared and unrewritten") {
    import spark.implicits._
    val root =
      java.nio.file.Files.createTempDirectory("graft_erase").toString + "/t"
    // v0 holds the doomed key 7; v1's tranche is clean
    Snapshots.commitAppend(spark, root,
      Seq((7L, "a"), (1L, "b"), (2L, "c")).toDF("k", "p").coalesce(1))
    Snapshots.commitAppend(spark, root,
      Seq((3L, "d"), (4L, "e")).toDF("k", "p").coalesce(1))
    val cleanFile = Snapshots.manifest(spark, root, 1)
      .diff(Snapshots.manifest(spark, root, 0))
    val rewritten = Snapshots.eraseAcrossHistory(spark, root, "k", Seq("7"))
    assert(rewritten == 1) // only v0's tranche held key 7
    def ks(v: Int): Seq[Long] = Snapshots.readSnapshot(spark, root, v)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ks(0) == Seq(1, 2))          // history readable, key gone
    assert(ks(1) == Seq(1, 2, 3, 4))
    // the clean tranche kept its exact physical path (still shared)
    assert(Snapshots.manifest(spark, root, 1).toSet
      .intersect(cleanFile.toSet) == cleanFile.toSet)
  }

  test("eraseAcrossHistory keeps NULL-key rows in rewritten files — " +
      "`!k IN (doomed)` is NULL, not true, for NULL keys, and a non-" +
      "null-safe keep predicate would silently destroy them") {
    import spark.implicits._
    val root =
      java.nio.file.Files.createTempDirectory("graft_erase_null").toString + "/t"
    // one file holding a doomed key AND a null-key row: the rewrite
    // must drop only the doomed row
    Snapshots.commitAppend(spark, root,
      Seq((Option(7L), "a"), (Option.empty[Long], "n"), (Option(1L), "b"))
        .toDF("k", "p").coalesce(1))
    val rewritten = Snapshots.eraseAcrossHistory(spark, root, "k", Seq("7"))
    assert(rewritten == 1)
    val rows = Snapshots.readSnapshot(spark, root, 0)
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(rows == Set((Some(1L), "b"), (None, "n")),
      s"null-key row must survive the rewrite, got $rows")
  }

  test("history and eraseAcrossHistory work AFTER a vacuum (live-version " +
      "enumeration, not an assumed 0..cur range), and vacuum is " +
      "re-runnable") {
    import spark.implicits._
    val root =
      java.nio.file.Files.createTempDirectory("graft_vac2").toString + "/t"
    Snapshots.commitAppend(spark, root,
      Seq((7L, "a"), (1L, "b")).toDF("k", "p").coalesce(1))      // v0
    Snapshots.commitAppend(spark, root,
      Seq((7L, "c"), (2L, "d")).toDF("k", "p").coalesce(1))      // v1
    Snapshots.commitAppend(spark, root,
      Seq((3L, "e")).toDF("k", "p").coalesce(1))                 // v2
    Snapshots.vacuum(spark, root, retainLast = 2)                // drops v0
    assert(Snapshots.liveVersions(spark, root) == Seq(1, 2))
    // history: only live versions, no FileNotFoundException
    val hist = Snapshots.history(spark, root)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(hist.keySet == Set(1, 2) && hist(2) == 5L)
    // erasure (right-to-be-forgotten) must still be possible post-vacuum
    val rewritten = Snapshots.eraseAcrossHistory(spark, root, "k", Seq("7"))
    assert(rewritten >= 1)
    (1 to 2).foreach { v =>
      val ks = Snapshots.readSnapshot(spark, root, v)
        .collect().map(_.getLong(0)).toSet
      assert(!ks.contains(7L), s"v$v still holds the doomed key")
    }
    // a second vacuum over the already-pruned log must not assume v0 exists
    Snapshots.vacuum(spark, root, retainLast = 1)
    assert(Snapshots.liveVersions(spark, root) == Seq(2))
  }

  test("vacuum: deletes only files outside the retention horizon, " +
      "keeps shared files, current stays exact") {
    import spark.implicits._
    val root =
      java.nio.file.Files.createTempDirectory("graft_vac").toString + "/t"
    Snapshots.commitAppend(spark, root, Seq(1, 2, 3).toDF("x")) // v0
    Snapshots.commitAppend(spark, root, Seq(4, 5).toDF("x"))    // v1
    val v0Files = Snapshots.manifest(spark, root, 0)
    Snapshots.commitRemove(spark, root, v0Files)                 // v2: {4,5}

    val deleted = Snapshots.vacuum(spark, root, retainLast = 1)
    // v0's tranche is unreferenced by v2 → gone; v1's survives IN v2
    assert(deleted.toSet == v0Files.toSet)
    deleted.foreach(p => assert(!new java.io.File(
      new java.net.URI(p).getPath).exists(), s"$p not deleted"))
    assert(Snapshots.readSnapshot(spark, root, 2)
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(4, 5))
    // pre-horizon manifests are dropped with their files
    intercept[java.io.FileNotFoundException] {
      Snapshots.manifest(spark, root, 0)
    }
    assert(Snapshots.currentVersion(spark, root) == 2)
  }
}
