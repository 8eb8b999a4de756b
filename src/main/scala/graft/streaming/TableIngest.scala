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
  *     [[ingestBatch]] runs recover() first, which completes the commit
  *     INCLUDING the marker; the redelivered batch then sees the marker
  *     and skips;
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

  /** Idempotently append one micro-batch. Returns true if the batch wrote,
    * false if its marker showed it already committed (duplicate delivery).
    */
  def ingestBatch(batch: DataFrame, tableDir: String, batchId: Long): Boolean = {
    val spark = batch.sparkSession
    val table = new Path(tableDir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = s"b$batchId"
    // recovery FIRST: an interrupted predecessor may hold this very
    // batch's commit point — completing it writes the marker we test
    if (fs.exists(table)) GraftParquetWrite.recover(fs, table)
    if (GraftParquetWrite.markerExists(fs, table, marker)) false
    else {
      batch.write.format("graft-parquet")
        .option("graft.commitMarker", marker)
        .mode("append").save(tableDir)
      true
    }
  }

  /** Wire a streaming frame into the table: one idempotent connector
    * commit per micro-batch.
    */
  def ingestTableStream(df: DataFrame, tableDir: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, tableDir, batchId): Unit
      }
      .start()

  /** Drop markers for batch ids below `keepFrom`. The checkpoint can only
    * redeliver the last uncommitted batch, so ids below (highWater −
    * retention) are dead weight; callers typically pass
    * `latestBatchId − 100`.
    */
  def pruneMarkers(spark: org.apache.spark.sql.SparkSession, tableDir: String,
      keepFrom: Long): Int = {
    val dir = new Path(new Path(tableDir), "_commits")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) 0
    else {
      val dead = fs.listStatus(dir).map(_.getPath).filter { p =>
        p.getName.startsWith("b") &&
          scala.util.Try(p.getName.drop(1).toLong).toOption.exists(_ < keepFrom)
      }
      dead.foreach(fs.delete(_, false))
      dead.length
    }
  }
}
