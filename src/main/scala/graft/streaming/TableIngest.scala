package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.v2.GraftParquetWrite

/** Exactly-once streaming append into a zone-mapped `graft-parquet` table.
  *
  * foreachBatch is at-least-once: after a crash between the sink action and
  * the checkpoint commit, the SAME batchId is redelivered and a plain
  * append would duplicate its rows. The dedup key here is a per-batch
  * commit marker that rides the connector's own manifest (a `!b<batchId>`
  * line — see [[graft.sources.v2.GraftParquetWrite]]): `_commits/b<id>`
  * appears atomically-with-replay alongside the batch's data files, so
  * every crash window resolves the same way —
  *
  *   - crash before the manifest lands: staging is garbage, the marker
  *     does not exist, the redelivered batch writes again (zero rows of
  *     the aborted attempt are visible);
  *   - crash after the manifest, before roll-forward finishes: the next
  *     [[ingestBatch]] runs healPublished() first, which completes the
  *     commit INCLUDING the marker; the redelivered batch then sees the
  *     marker and skips;
  *   - duplicate delivery with no crash: the marker exists, skip.
  *
  * Every batch lands through the ordinary connector write, so the zone-map
  * sidecar accrues per batch and the whole skipping stack (file pruning,
  * metadata aggregates, statistics, runtime join filters) works on the
  * live, continuously-fed table. Periodic [[graft.sources.v2
  * .GraftTableOptimize]] runs bin-pack the accumulated small batches.
  *
  * Markers accumulate one empty file per batch; [[pruneMarkers]] drops
  * those older than a retention window of batch ids. Safe because Spark's
  * checkpoint only ever redelivers the LAST uncommitted batch — ids far
  * below the high-water mark can never be offered again.
  */
object TableIngest {

  /** Stable identity of one ingestion LINEAGE, derived from the checkpoint
    * path: the same checkpoint across restarts keeps one lineage (markers
    * dedupe batch redeliveries exactly-once), while a NEW checkpoint over
    * the same table is a new lineage whose batch 0 must not collide with
    * the old stream's batch 0 — Spark renumbers from zero, and a shared
    * namespace would silently DROP the new stream's early batches. A new
    * lineage re-ingesting rows is visible and intentional (a backfill);
    * silent drops are neither.
    */
  def lineageOf(checkpoint: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(checkpoint.getBytes("UTF-8"))
    // 16 hex chars (64 bits): two colliding lineages would share a marker
    // namespace and silently cross-dedupe each other's batches — the exact
    // drop this digest exists to prevent, so the prefix is sized where
    // collisions are negligible, not merely unlikely
    d.take(8).map(b => f"$b%02x").mkString
  }

  /** How often [[ingestBatch]] self-prunes markers (every Nth batch). */
  private val PruneEvery = 16L

  /** Idempotently append one micro-batch. Returns true if the batch wrote,
    * false if its marker showed it already committed (duplicate delivery).
    * `lineage` namespaces the marker (see [[lineageOf]]); callers driving
    * batches by hand outside any stream may leave it empty.
    *
    * Marker retention is SELF-MAINTAINING: every [[PruneEvery]]th batch
    * drops this lineage's markers below `batchId - retainMarkers`, so a
    * year-long stream never accrues unbounded empty marker files. Safe at
    * any positive retention because the checkpoint can only redeliver the
    * LAST uncommitted batch — an id `retainMarkers` below the high-water
    * mark can never be offered again. Pass `retainMarkers = 0` to disable
    * (callers replaying batches by hand outside a checkpointed stream).
    *
    * `legacyLineageDedup` is the ONE-RESTART upgrade shim for checkpoints
    * that committed markers under the pre-widening 12-hex namespace: it
    * additionally consults `take(12)`-prefixed markers (both are prefixes
    * of the same digest). OFF by default and meant to be turned off again
    * after the upgrade restart — leaving it on permanently would narrow
    * the dedup namespace back to the 48 bits the widening escaped.
    *
    * The COMMIT LOG is self-maintaining on the same tick as the markers:
    * when the record count exceeds `foldLogOver`, the log folds
    * retention-aware ([[graft.sources.v2.GraftTableOptimize.foldLog]],
    * keeping the newest `foldLogOver / 2` records as AS-OF history) — so a
    * year-long stream plans O(foldLogOver) small log reads instead of
    * O(batches), without an operator remembering to run OPTIMIZE, and a
    * snapshot handle taken within the retention tail keeps resolving
    * across the folds. Pass `foldLogOver = 0` to disable.
    */
  def ingestBatch(batch: DataFrame, tableDir: String, batchId: Long,
      lineage: String = "", retainMarkers: Int = 100,
      legacyLineageDedup: Boolean = false, foldLogOver: Int = 64): Boolean = {
    val spark = batch.sparkSession
    val table = new Path(tableDir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = markerName(lineage, batchId)
    // heal FIRST: an interrupted predecessor may hold this very batch's
    // commit point — completing it writes the marker we test. Healing
    // (not the full recover sweep) so a CONCURRENT ingest job mid-stage is
    // never killed: the commit log arbitrates seqs optimistically, and
    // unmanifested crash garbage ages into vacuum instead.
    if (fs.exists(table)) GraftParquetWrite.healPublished(fs, table)
    val legacyHit = legacyLineageDedup && lineage.length == 16 &&
      GraftParquetWrite.markerExists(fs, table, markerName(lineage.take(12), batchId))
    if (legacyHit || GraftParquetWrite.markerExists(fs, table, marker)) false
    else {
      batch.write.format("graft-parquet")
        .option("graft.commitMarker", marker)
        .mode("append").save(tableDir)
      if (batchId > 0 && batchId % PruneEvery == 0) {
        if (retainMarkers > 0 && batchId > retainMarkers)
          pruneMarkers(spark, tableDir, keepFrom = batchId - retainMarkers, lineage): Unit
        if (foldLogOver > 0 &&
            GraftParquetWrite.logRecordFiles(fs, table).length > foldLogOver)
          graft.sources.v2.GraftTableOptimize.foldLog(fs, table,
            retain = foldLogOver / 2): Unit
      }
      true
    }
  }

  /** One batch's durable receipt: whether it wrote (false = the marker
    * absorbed a duplicate delivery) and the commit-log sequence current
    * AFTER the call — the snapshot handle a training job records as
    * "corpus as of batch N" and replays later via
    * `option("graft.asOfSeq", seq)`. The seq is read after recovery and
    * the (idempotent) write, so on both the wrote and the skipped path it
    * names a state that CONTAINS this batch.
    */
  final case class IngestReceipt(wrote: Boolean, seq: Option[Long])

  /** [[ingestBatch]] plus the snapshot handle ([[IngestReceipt]]). */
  def ingestBatchRecorded(batch: DataFrame, tableDir: String, batchId: Long,
      lineage: String = "", retainMarkers: Int = 100,
      legacyLineageDedup: Boolean = false, foldLogOver: Int = 64): IngestReceipt = {
    val wrote = ingestBatch(batch, tableDir, batchId, lineage, retainMarkers,
      legacyLineageDedup, foldLogOver)
    IngestReceipt(wrote, currentSeq(batch.sparkSession, tableDir))
  }

  /** The table's current commit-log sequence (None before any commit). */
  def currentSeq(spark: org.apache.spark.sql.SparkSession, tableDir: String): Option[Long] = {
    val table = new Path(tableDir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(table)) None else GraftParquetWrite.currentSeq(fs, table)
  }

  private def markerName(lineage: String, batchId: Long): String =
    if (lineage.isEmpty) s"b$batchId" else s"$lineage-b$batchId"

  /** Wire a streaming frame into the table: one idempotent connector
    * commit per micro-batch, markers namespaced by the checkpoint's
    * lineage.
    *
    * Maintenance contract: [[graft.sources.v2.GraftTableOptimize]] runs
    * against this table require the stream PAUSED (the maintenance window —
    * an optimize's recover() sweep would discard an in-flight batch's
    * staging mid-write, and a swap racing appends would retry or abort
    * under the commit log's conflict validation). Concurrent APPEND jobs
    * need no window — the log arbitrates their seqs optimistically — but
    * multi-writer ingest should disable the self-fold tick (foldLogOver=0)
    * and leave folding to one maintenance owner.
    */
  def ingestTableStream(df: DataFrame, tableDir: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      legacyLineageDedup: Boolean = false): StreamingQuery = {
    val lineage = lineageOf(checkpoint)
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, tableDir, batchId, lineage,
          legacyLineageDedup = legacyLineageDedup): Unit
      }
      .start()
  }

  /** Drop one lineage's markers for batch ids below `keepFrom`. The
    * checkpoint can only redeliver the last uncommitted batch, so ids
    * below (highWater − retention) are dead weight; callers typically pass
    * `latestBatchId − 100`.
    */
  def pruneMarkers(spark: org.apache.spark.sql.SparkSession, tableDir: String,
      keepFrom: Long, lineage: String = ""): Int = {
    val dir = new Path(new Path(tableDir), "_commits")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = markerName(lineage, 0L).dropRight(1) // "b" or "<lineage>-b"
    if (!fs.exists(dir)) 0
    else {
      val dead = fs.listStatus(dir).map(_.getPath).filter { p =>
        p.getName.startsWith(prefix) &&
          scala.util.Try(p.getName.drop(prefix.length).toLong).toOption
            .exists(_ < keepFrom)
      }
      dead.foreach(fs.delete(_, false))
      dead.length
    }
  }
}
