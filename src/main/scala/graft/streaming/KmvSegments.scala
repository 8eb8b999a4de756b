package graft.streaming

import graft.operators.Sketches
import org.apache.hadoop.fs.{FileSystem, Path}
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
  * Crash safety: each merge writes a fresh `v<batchId>` state directory,
  * then atomically renames the `current` pointer file onto it (the same
  * staging+rename discipline as the sidecar metas). A crash between the
  * two leaves the pointer on the PREVIOUS state — the redelivered batch
  * re-merges idempotently. Superseded version dirs are deleted after the
  * swap; a crash in that window leaves an orphan dir no pointer names.
  * SINGLE-WRITER, like every sidecar here: one stream owns a state dir
  * (foreachBatch serializes its merges); concurrent writers would lose
  * updates at the pointer swap. An out-of-order redelivery may regress
  * the version NAME, never the content — the re-merge is a superset of
  * the state it read.
  */
object KmvSegments {

  private def pointerPath(stateDir: Path) = new Path(stateDir, "current")

  /** The live state (`seg`, `kmv` array<long> asc), or None before the
    * first merge. Follows the `current` pointer, never lists versions.
    */
  def state(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val dir = new Path(stateDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    currentVersion(fs, dir).map(v => spark.read.parquet(new Path(dir, v).toString))
  }

  private def currentVersion(fs: FileSystem, dir: Path): Option[String] = {
    val p = pointerPath(dir)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
        buf.toByteArray
      } finally in.close()
      Some(new String(bytes, "UTF-8").trim)
    }
  }

  /** Merge one micro-batch into the persisted state and swap it live.
    * Returns the new per-segment state. `batchId` keys the version dir, so
    * a redelivered batch overwrites its own staging and re-merges into the
    * same (idempotent) result.
    */
  def mergeBatch(batch: DataFrame, stateDir: String, segCol: String,
      keyCol: String, k: Int, batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    val dir = new Path(stateDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partial = Sketches.sketch(batch, segCol, keyCol, k)
      .withColumnRenamed(segCol, "seg")
    val empty = array().cast("array<bigint>")
    val merged = state(spark, stateDir) match {
      case None => partial
      case Some(prev) =>
        prev.withColumnRenamed("kmv", "__prev")
          .join(partial.withColumnRenamed("kmv", "__new"), Seq("seg"), "full_outer")
          .select(col("seg"),
            Sketches.mergeCol(
              coalesce(col("__prev"), empty), coalesce(col("__new"), empty), k).as("kmv"))
    }
    val vName = s"v$batchId"
    val vPath = new Path(dir, vName)
    // segments-sized state: one file per version is the right layout
    merged.coalesce(1).write.mode("overwrite").parquet(vPath.toString)
    val prev = currentVersion(fs, dir)
    val staging = new Path(dir, "current.staging")
    val out = fs.create(staging, true)
    try out.write(vName.getBytes("UTF-8")) finally out.close()
    val p = pointerPath(dir)
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(staging, p))
      throw new graft.GraftDataError(s"kmv state: pointer swap failed under $dir")
    prev.filter(_ != vName).foreach(v => fs.delete(new Path(dir, v), true))
    spark.read.parquet(vPath.toString)
  }

  /** The stream form: each micro-batch merges and swaps, state readable
    * live via [[state]] / estimable via
    * [[graft.operators.Sketches.overlapMatrix]].
    */
  def stream(events: DataFrame, stateDir: String, segCol: String,
      keyCol: String, k: Int): StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, stateDir, segCol, keyCol, k, batchId): Unit
      }
      .start()
}
