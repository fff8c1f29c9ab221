package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chunk-merge semantics (reference: `_merge_broadband_points` /
  * `_merge_psd_chunks`, `app/services/get_aggregations.py:240-288`).
  *
  * The reference aggregates month/day chunks independently and merges the
  * per-chunk points into one dict keyed by timestamp — later chunks
  * overwrite earlier on collision ("last wins"), emitted key-sorted.
  *
  * In our engine the chunk loop itself is gone (one partitioned scan,
  * SURVEY §4.2.1), but the merge operator is kept as a first-class op: it is
  * exactly the incremental-reprocessing primitive a 100 TB pipeline needs
  * when a late partition is recomputed and must override the previous
  * result. Implemented as union + per-key max-priority select — one shuffle
  * on the key.
  */
object MergeOps {

  /** J3/U1 — union `chunks` (schema-aligned by name) and keep, per key, the
    * row from the *latest* chunk (highest index = last wins). Deterministic:
    * the chunk index is an explicit priority column, and ties WITHIN a
    * chunk (duplicate keys in one recomputed partition) break on the
    * remaining columns rather than physical row order — task retries and
    * shuffle reordering cannot flip the winner. */
  def lastWinsMerge(chunks: Seq[DataFrame], keyCols: Seq[String]): DataFrame = {
    require(chunks.nonEmpty, "lastWinsMerge needs at least one chunk")
    val tagged = chunks.zipWithIndex.map { case (df, i) =>
      df.withColumn("__chunk", lit(i))
    }
    val unioned = tagged.reduce(_.unionByName(_))
    val tieBreak = unioned.columns
      .filterNot(c => keyCols.contains(c) || c == "__chunk")
      .map(col(_).desc)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__chunk").desc +: tieBreak.toIndexedSeq: _*)
    unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__chunk")
  }

  /** SCD2 (slowly-changing-dimension type 2) interval builder: turn a
    * change log — one row per (entity, change event) — into validity
    * intervals `[valid_from, valid_to)` per version, with the open current
    * version closed at `endOfTime` (the standard high-date sentinel; NULL
    * would poison downstream range predicates and engine compares).
    *
    * One window over (entity) ordered by (event time, tieBreak): each
    * version's `valid_to` is the NEXT version's `valid_from` (`lead`).
    * Single shuffle on the entity key, map-side everything else — the
    * shape survives a 10⁹-entity dimension because state per group is one
    * row of lookahead, not the whole history. `tieBreak` makes same-instant
    * changes deterministic (later tieBreak = later version). */
  def scd2Intervals(changes: DataFrame, entityCol: String, tsCol: String,
      tieBreak: String, endOfTime: String): DataFrame = {
    val tsType = changes.schema(tsCol).dataType
    val sentinel = lit(endOfTime).cast(tsType)
    // eager sentinel validation: under non-ANSI mode an unparseable
    // endOfTime casts to NULL at runtime, silently reintroducing exactly
    // the open-ended NULL valid_to this operator exists to prevent (ANSI
    // mode would instead fail mid-job). One 1-row local job at plan time
    // catches it at the call site in both modes, with one error contract.
    val sentinelOk =
      try changes.sparkSession.range(1).select(sentinel).head.get(0) != null
      catch { case _: Exception => false }
    require(sentinelOk,
      s"endOfTime sentinel '$endOfTime' does not cast to $tsType")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieBreak))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to",
        coalesce(lead(col(tsCol), 1).over(w), sentinel))
      .withColumn("is_current",
        (lead(col(tsCol), 1).over(w).isNull).cast("int"))
  }

  /** CDC apply — MERGE INTO semantics for a change feed against a keyed
    * snapshot: `cdc` rows carry `(opCol ∈ {I,U,D}, keyCol, seqCol,
    * payload…)`; per key the HIGHEST-`seqCol` operation wins (CDC
    * compaction), then a winning `D` removes the key, a winning `I`/`U`
    * replaces (or introduces) the row wholesale.
    *
    * Scale shape: the rank window runs over the CHANGE FEED only (delta-
    * sized — never the snapshot), and the snapshot's single shuffle is
    * the anti-join on the key (AQE-planned; broadcastable when the
    * compacted delta is small, which a per-batch CDC feed usually is).
    * This is the lakehouse MERGE pattern with the Delta/Iceberg
    * implementation idiom — touched keys drop out, winners union in —
    * rather than a row-by-row upsert loop.
    *
    * `seqCol` must be unique per (key) among that key's changes — equal
    * sequence numbers would make the winner nondeterministic, so ties
    * fail fast rather than silently picking one. */
  def applyCdc(snapshot: DataFrame, cdc: DataFrame, keyCol: String,
      opCol: String, seqCol: String): DataFrame = {
    // materialized once: the duplicate-seq guard, the winners projection
    // and the anti-join each evaluate the feed — unmaterialized, a
    // derived change feed (q_cdc_apply unions four filtered source
    // scans) re-ran per reference
    val c = cdc.localCheckpoint(true)
    val dupSeq = c.groupBy(col(keyCol), col(seqCol))
      .count().filter(col("count") > 1).limit(1).collect()
    if (dupSeq.nonEmpty)
      throw new IllegalArgumentException(
        s"applyCdc: duplicate $seqCol for key ${dupSeq.head.get(0)} — " +
          "the winning operation would be nondeterministic")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    val latest = c.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val winners = latest.filter(col(opCol) =!= "D")
      .select(snapshot.columns.map(col).toIndexedSeq: _*)
    snapshot
      .join(latest.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(winners)
  }

  /** Versioned CDC apply — [[applyCdc]] made OUT-OF-ORDER tolerant for
    * continuous sinks: the snapshot carries `verCol` (sequence of the
    * last change applied per key; seed base rows with 0) and `delCol`
    * (tombstone flag; seed false), and a feed operation only lands if
    * its sequence EXCEEDS the stored one — a stale replay keeps the
    * newer state. Deletes RETAIN the key as a tombstoned row (the
    * Kafka-compaction / Delta-CDF discipline): dropping it would lose
    * the delete's sequence and let a stale pre-delete update resurrect
    * the key on out-of-order arrival — exactly the bug RollupSpec's
    * delete-arrives-first permutation pins. A genuinely NEWER insert
    * after the delete (higher seq) does resurrect, as it should.
    * Readers filter `!delCol`; tombstone retention/GC is a separate
    * maintenance policy (same vacuum shape as rollup versions).
    *
    * Sequential application over any content-to-batch assignment and
    * any redelivery converges to the same snapshot as one compacted
    * apply of the whole feed. Scale shape as [[applyCdc]]: compaction
    * windows over the DELTA only; the snapshot pays one key-shuffle
    * through a full-outer join (AQE-planned). */
  def applyCdcVersioned(snapshot: DataFrame, cdc: DataFrame, keyCol: String,
      opCol: String, seqCol: String, verCol: String = "__seq",
      delCol: String = "__deleted"): DataFrame = {
    Seq(verCol, delCol).foreach { c =>
      require(snapshot.columns.contains(c),
        s"applyCdcVersioned: snapshot must carry $c (seed 0 / false)")
    }
    val dupSeq = cdc.groupBy(col(keyCol), col(seqCol))
      .count().filter(col("count") > 1).limit(1).collect()
    if (dupSeq.nonEmpty)
      throw new IllegalArgumentException(
        s"applyCdcVersioned: duplicate $seqCol for key ${dupSeq.head.get(0)} — " +
          "the winning operation would be nondeterministic")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    val latest = cdc.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val payload = snapshot.columns
      .filterNot(c => c == verCol || c == delCol || c == keyCol)
    val d = latest.select(
      (Seq(col(keyCol).as("__k"), col(opCol).as("__op"),
           col(seqCol).as("__s")) ++
        payload.map(c => col(c).as(s"__p_$c"))): _*)
    val joined = snapshot.join(d, col(keyCol) === col("__k"), "full_outer")
    val applies = col("__k").isNotNull &&
      (col(keyCol).isNull || col("__s") > col(verCol))
    joined.select(
      (coalesce(col(keyCol), col("__k")).as(keyCol) +:
        payload.map(c =>
          when(applies, col(s"__p_$c")).otherwise(col(c)).as(c)) :+
        when(applies, col("__s")).otherwise(coalesce(col(verCol), lit(0L)))
          .as(verCol) :+
        when(applies, col("__op") === "D")
          .otherwise(coalesce(col(delCol), lit(false))).as(delCol)): _*)
  }

  /** U3 — schema-consistency guard: all chunks must share one schema
    * (reference 502s on frequency-column mismatch, ref `:277-281`). */
  def requireSameSchema(chunks: Seq[DataFrame]): Unit = {
    val schemas = chunks.map(_.schema).distinct
    if (schemas.size > 1)
      throw graft.planner.Errors.AggregationError(
        s"inconsistent chunk schemas: ${schemas.mkString(" vs ")}")
  }
}
