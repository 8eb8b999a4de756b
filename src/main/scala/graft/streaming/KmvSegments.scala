package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Continuous audience sketches: a per-segment KMV state table maintained
  * across micro-batches, so "how many distinct users has segment S seen —
  * and how many does it SHARE with segment T" is answerable at any moment
  * from segments-sized state (S rows × k longs, KB against a 100 TB
  * stream) without ever rescanning it.
  *
  * Why KMV and not the HLL partials the rolling-distinct rollup uses:
  * HLL unions answer per-segment counts, but the audience question is the
  * INTERSECTION matrix ([[graft.operators.Sketches.overlapMatrix]]), which
  * HLL cannot estimate and KMV can.
  *
  * Merge algebra: k-smallest-of-the-deduped-union — associative,
  * commutative, and IDEMPOTENT. So any batch split converges to the state
  * the one-shot batch build produces (bitwise — the spec pins it), and an
  * at-least-once redelivery merges as a no-op. No dedup bookkeeping, no
  * replay window: the sketch IS the dedup.
  *
  * Versioning, commit records, crash recovery and the reader grace window
  * are [[VersionedState]]'s (shared with [[RollupState]]); a committed
  * batchId additionally SKIPS outright here — cheaper than the no-op
  * re-merge idempotence would allow. An out-of-order redelivery may
  * regress the version NAME, never the content — the re-merge is a
  * superset of the state it read.
  */
object KmvSegments {

  /** The live state (`seg`, `kmv` array<long> asc), or None before the
    * first merge. A reader holding this frame across MULTIPLE merges must
    * re-call (see [[VersionedState]]'s grace window).
    */
  def state(spark: SparkSession, stateDir: String): Option[DataFrame] =
    VersionedState.read(spark, stateDir)

  /** Merge one micro-batch into the persisted state and swap it live.
    * Returns the new per-segment state.
    */
  def mergeBatch(batch: DataFrame, stateDir: String, segCol: String,
      keyCol: String, k: Int, batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    // the pointer is this batch's commit record: a redelivery whose
    // version is already live skips (idempotence: the state holds it)
    if (VersionedState.isCommitted(spark, stateDir, batchId))
      return VersionedState.read(spark, stateDir).get
    val partial = Sketches.sketch(batch, segCol, keyCol, k)
      .withColumnRenamed(segCol, "seg")
    val empty = array().cast("array<bigint>")
    val merged = state(spark, stateDir) match {
      case None => partial
      case Some(prev) =>
        // null-safe on seg: a NULL segment is a group like any other, and
        // a USING join would re-append it un-merged every batch (split
        // sketches that never union) — join with <=> and coalesce seg out
        prev.withColumnsRenamed(Map("kmv" -> "__prev", "seg" -> "__pseg"))
          .join(partial.withColumnRenamed("kmv", "__new"),
            col("__pseg") <=> col("seg"), "full_outer")
          .select(coalesce(col("__pseg"), col("seg")).as("seg"),
            Sketches.mergeCol(
              coalesce(col("__prev"), empty), coalesce(col("__new"), empty), k).as("kmv"))
    }
    // segments-sized state: one file per version is the right layout
    VersionedState.commit(merged, stateDir, batchId, coalesceTo = 1)
  }

  /** The stream form: each micro-batch merges and swaps, state readable
    * live via [[state]] / estimable via
    * [[graft.operators.Sketches.overlapMatrix]]. Pass `checkpointDir` in
    * production — the redelivery semantics above need the source offsets
    * to survive a restart; without it Spark uses a discard-on-stop temp
    * checkpoint and a restarted query replays from the source's beginning
    * (content still converges, by idempotence, but there is no recovery
    * story).
    */
  def stream(events: DataFrame, stateDir: String, segCol: String,
      keyCol: String, k: Int, checkpointDir: Option[String] = None): StreamingQuery = {
    val w = events.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, stateDir, segCol, keyCol, k, batchId): Unit
      }
    checkpointDir.fold(w)(c => w.option("checkpointLocation", c)).start()
  }
}
