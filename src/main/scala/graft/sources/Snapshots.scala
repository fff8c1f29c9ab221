package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, sum}
import org.apache.hadoop.fs.Path

/** Versioned snapshot reads over a flat parquet archive — the TIME
  * TRAVEL lakehouse primitive (Delta `versionAsOf` / Iceberg snapshot
  * reads, re-expressed Spark-first): every commit writes its data files
  * under an immutable per-commit subdirectory and records the FULL file
  * list of the resulting table state as a manifest in a `_log/` sidecar;
  * reading version v is then just `spark.read.parquet(manifest(v)…)` —
  * planning cost O(files in v), zero reconciliation, and any historical
  * version stays readable until its files are vacuumed because commits
  * never mutate data files in place (append adds a directory; remove
  * only edits the NEXT manifest).
  *
  * Scale contract: manifests are file LISTS — metadata-scale by the same
  * argument as [[SkipIndex]]/[[Deletes]] (Spark's own FileIndex collects
  * the identical listing), so the driver-side read/write here is O(file
  * count), never O(rows). Data movement happens only inside ordinary
  * distributed `df.write.parquet` calls.
  *
  * Layout:
  * {{{
  *   table/
  *     _log/v00000.txt      one absolute data-file path per line
  *     _log/v00001.txt
  *     v0/part-….parquet    commit 0's immutable data files
  *     v1/part-….parquet
  * }}}
  * The `_log` prefix hides the manifests from data scans (Spark's
  * FileIndex skips `_`/`.` paths — the `_deletes`/`_skipindex` trick),
  * and snapshot reads never list the table dir at all, so the per-commit
  * subdirectories need no special casing.
  */
object Snapshots {

  private def logDir(dir: String) = new Path(s"$dir/_log")

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The versions whose manifests actually exist in `_log/`, ascending.
    * After a [[vacuum]] this is a suffix of 0..current — [[history]] and
    * [[eraseAcrossHistory]] iterate THIS, never an assumed 0..cur range
    * (a vacuumed table would otherwise throw FileNotFoundException on
    * the dropped manifests, making post-vacuum erasure impossible). */
  def liveVersions(spark: SparkSession, dir: String): Seq[Int] = {
    val f = fs(spark, dir)
    if (!f.exists(logDir(dir))) Nil
    else f.listStatus(logDir(dir)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toInt }
      .sorted
  }

  /** Highest committed version, or -1 for an empty/absent table. */
  def currentVersion(spark: SparkSession, dir: String): Int =
    liveVersions(spark, dir).lastOption.getOrElse(-1)

  /** The data files constituting snapshot `version`. */
  def manifest(spark: SparkSession, dir: String, version: Int): Seq[String] = {
    val p = new Path(logDir(dir), f"v$version%05d.txt")
    val in = fs(spark, dir).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  private def writeManifest(spark: SparkSession, dir: String, version: Int,
      files: Seq[String]): Unit = {
    val f = fs(spark, dir)
    f.mkdirs(logDir(dir))
    val out = f.create(new Path(logDir(dir), f"v$version%05d.txt"), true)
    try out.write((files.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** List the parquet files a commit's write just produced. */
  private def dataFiles(spark: SparkSession, sub: Path): Seq[String] = {
    val f = sub.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.listStatus(sub).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
  }

  /** Commit `df` as an APPEND: new immutable files under `dir/v<N>/`,
    * next manifest = previous files ∪ new files. Returns the new
    * version. */
  def commitAppend(spark: SparkSession, dir: String, df: DataFrame): Int = {
    val v = currentVersion(spark, dir) + 1
    val sub = new Path(s"$dir/v$v")
    df.write.mode(SaveMode.Overwrite).parquet(sub.toString)
    val prev = if (v == 0) Nil else manifest(spark, dir, v - 1)
    writeManifest(spark, dir, v, prev ++ dataFiles(spark, sub))
    v
  }

  /** Token-idempotent append for at-least-once deliverers (streaming
    * `foreachBatch`: a crash between the data landing and the
    * checkpoint advancing re-delivers the batch). The token — e.g.
    * `"<streamId>-<batchId>"` — names the commit: a re-delivery finds
    * the token marker and returns the already-assigned version instead
    * of appending twice. The data dir is token-named (re-delivery
    * overwrites the same files, not new ones) and the manifest is
    * de-duplicated, so even the crash window between manifest and
    * marker degrades to one redundant-but-identical version, never to
    * doubled rows — the appendBroadbandBatch exactly-once discipline
    * applied to the commit log. */
  def commitAppendOnce(spark: SparkSession, dir: String, df: DataFrame,
      token: String): Int = {
    val f = fs(spark, dir)
    val tok = new Path(logDir(dir), s"tok-$token.txt")
    if (f.exists(tok)) {
      val in = f.open(tok)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().next().trim.toInt
      finally in.close()
    } else {
      val sub = new Path(s"$dir/b-$token")
      df.write.mode(SaveMode.Overwrite).parquet(sub.toString)
      val v = currentVersion(spark, dir) + 1
      val prev = if (v == 0) Nil else manifest(spark, dir, v - 1)
      writeManifest(spark, dir, v,
        (prev ++ dataFiles(spark, sub)).distinct)
      val out = f.create(tok, true)
      try out.write(s"$v\n".getBytes("UTF-8")) finally out.close()
      v
    }
  }

  /** Commit a REMOVAL of whole files (retention purge / post-compaction
    * drop): next manifest = previous minus `removed`. Data files stay on
    * disk — that is what keeps older snapshots readable; a vacuum that
    * deletes files unreferenced by any retained manifest is the
    * (separate, destructive) space-reclaim step. */
  def commitRemove(spark: SparkSession, dir: String,
      removed: Seq[String]): Int = {
    val v = currentVersion(spark, dir) + 1
    val gone = removed.toSet
    writeManifest(spark, dir, v,
      manifest(spark, dir, v - 1).filterNot(gone))
    v
  }

  /** Commit a COMPACTION/REWRITE: the freshly-written files REPLACE the
    * whole table state (next manifest = just these files). Historical
    * versions keep reading their own immutable files — compaction under
    * time travel, the OPTIMIZE-then-read-old-version contract. */
  def commitReplace(spark: SparkSession, dir: String, df: DataFrame): Int = {
    val v = currentVersion(spark, dir) + 1
    val sub = new Path(s"$dir/v$v")
    df.write.mode(SaveMode.Overwrite).parquet(sub.toString)
    writeManifest(spark, dir, v, dataFiles(spark, sub))
    v
  }

  /** Per-version history from parquet FOOTERS only — `(version,
    * n_files, n_rows)` with zero data pages read: each distinct file's
    * footer is read once (distributed, the [[SkipIndex]] mapPartitions
    * budget), then joined back to the version⨯file expansion, so a file
    * shared by 50 versions costs one footer, and the whole history
    * costs O(distinct files), not O(versions × rows). */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val versions = liveVersions(spark, dir)
    require(versions.nonEmpty, s"$dir has no commits")
    val vf = versions.flatMap(v =>
      manifest(spark, dir, v).map(f => (v, f)))
    val perFile = spark.createDataset(vf).toDF("version", "file")
    // ship the SESSION's Hadoop conf (spark.hadoop.* — s3a/abfs creds
    // etc.) to the executors; a bare `new Configuration()` only works
    // on local FS
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val counts = spark.createDataset(vf.map(_._2).distinct)
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.map { f =>
          val md = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
            conf, new Path(f),
            org.apache.parquet.format.converter
              .ParquetMetadataConverter.NO_FILTER)
          (f, md.getBlocks.asScala.map(_.getRowCount.toLong).sum)
        }
      }.toDF("file", "rows")
    perFile.join(counts, "file")
      .groupBy(col("version"))
      .agg(count(lit(1)).as("n_files"), sum("rows").as("n_rows"))
      .orderBy("version")
  }

  /** Read the table AS OF `version` — exactly that manifest's files.
    * Empty manifests read as an empty frame with the schema of any
    * sibling version's files (callers with a fully-vacated table supply
    * their own schema). */
  def readSnapshot(spark: SparkSession, dir: String, version: Int): DataFrame = {
    val files = manifest(spark, dir, version)
    require(files.nonEmpty, s"snapshot v$version of $dir lists no files")
    spark.read.parquet(files: _*)
  }

  /** Right-to-be-forgotten ACROSS HISTORY: physically remove every row
    * matching `doomed` keys from EVERY retained version — time travel
    * keeps working, but no version can resurrect the erased entity (the
    * gap plain [[Deletes]] tombstones can't close once a table has
    * snapshots: an old manifest happily re-reads the purged rows).
    *
    * Shape: one distributed probe pass over the distinct files of all
    * manifests finds the files that actually hold a doomed key
    * (`input_file_name ⋈ broadcast(doomed)` — the same request-scale
    * broadcast contract as [[Deletes.readWithDeletes]]); only those
    * files are rewritten (driver loop bounded by HIT count, not file
    * count — the bloom-routing argument), and every manifest swaps the
    * old paths for the rewritten ones in place. Untouched files stay
    * shared across versions; rewritten originals are deleted. Returns
    * the number of files rewritten. */
  def eraseAcrossHistory(spark: SparkSession, dir: String, keyCol: String,
      doomed: Seq[String]): Int = {
    import spark.implicits._
    val versions = liveVersions(spark, dir)
    require(versions.nonEmpty, s"$dir has no commits")
    val manifests = versions.map(v => v -> manifest(spark, dir, v)).toMap
    val allFiles = manifests.values.flatten.toSeq.distinct
    val doomedDf = doomed.toDF("__doomed_k")
    val hit = spark.read.parquet(allFiles: _*)
      .select(org.apache.spark.sql.functions.input_file_name().as("f"),
        col(keyCol).cast("string").as("__doomed_k"))
      .join(org.apache.spark.sql.functions.broadcast(doomedDf), "__doomed_k")
      .select("f").distinct().as[String].collect().toSeq
    // normalize: input_file_name yields URIs; manifests may hold either
    def norm(p: String) = new Path(p).toUri.getPath
    val hitSet = hit.map(norm).toSet
    val f = fs(spark, dir)
    val remap = allFiles.filter(p => hitSet(norm(p))).map { old =>
      val stamp = graft.text.TextOps.md5Hex(old).take(12)
      val sub = new Path(s"$dir/purge-$stamp")
      // null-safe keep predicate: `!k.isInCollection(doomed)` is NULL
      // (not true) for NULL keys, which would silently DROP every
      // null-key row in a rewritten file — the opposite of SQL
      // `DELETE WHERE key IN (...)`, which keeps them
      spark.read.parquet(old)
        .filter(col(keyCol).isNull ||
          !col(keyCol).cast("string").isInCollection(doomed))
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(sub.toString)
      old -> dataFiles(spark, sub)
    }.toMap
    manifests.toSeq.sortBy(_._1).foreach { case (v, files) =>
      writeManifest(spark, dir, v,
        files.flatMap(p => remap.getOrElse(p, Seq(p))))
    }
    remap.keys.foreach(p => f.delete(new Path(p), false))
    spark.catalog.refreshByPath(dir)
    remap.size
  }

  /** The destructive space-reclaim step: delete every data file
    * referenced ONLY by manifests older than the retention horizon
    * (the last `retainLast` versions), then drop those manifests.
    * Time travel stays exact within the horizon and becomes
    * deliberately impossible before it — the Delta/Iceberg VACUUM
    * contract. Returns the deleted file paths. Driver-side O(file
    * count), the same metadata-scale budget as the manifests
    * themselves. */
  def vacuum(spark: SparkSession, dir: String, retainLast: Int = 1)
      : Seq[String] = {
    require(retainLast >= 1, "must retain at least the current version")
    val versions = liveVersions(spark, dir)
    require(versions.nonEmpty, s"$dir has no commits to vacuum")
    // only versions whose manifests still exist — a second vacuum must
    // not assume the 0..cur range the first one already pruned
    val (dropVs, keepVs) =
      versions.splitAt(math.max(0, versions.size - retainLast))
    val keep = keepVs.flatMap(manifest(spark, dir, _)).toSet
    val doomed = dropVs
      .flatMap(manifest(spark, dir, _)).toSet
      .diff(keep).toSeq.sorted
    val f = fs(spark, dir)
    doomed.foreach(p => f.delete(new Path(p), false))
    dropVs.foreach { v =>
      f.delete(new Path(logDir(dir), f"v$v%05d.txt"), false): Unit
    }
    // deleted paths can linger in Spark's FileStatusCache (the
    // fs-mutation gotcha SkipIndex/Deletes already guard against)
    spark.catalog.refreshByPath(dir)
    doomed
  }
}
