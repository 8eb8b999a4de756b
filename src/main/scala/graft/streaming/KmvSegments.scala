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
  * then swaps the `current` pointer file onto it (staging + rename, like
  * the sidecar metas). The pointer doubles as the batch's COMMIT RECORD:
  * a redelivered batchId whose version the pointer already names skips —
  * by idempotence the state already holds it — which also keeps a merge
  * from ever reading and overwriting the same version path. The rename
  * cannot overwrite, so the swap deletes the old pointer first; if a
  * crash lands inside that window, [[state]] falls back to the highest
  * `_SUCCESS`-complete version on disk — the batch in flight at the crash
  * never wrote its streaming commit, so it redelivers and re-merges onto
  * whichever base recovery picked (merging is a superset: content is safe
  * in every window). Superseded version dirs sweep AFTER the swap, except
  * the immediately-retired one — a one-merge grace window for a reader
  * whose plan still pins the previous directory; a reader that holds a
  * state frame across MULTIPLE merges must re-call [[state]].
  * SINGLE-WRITER, like every sidecar here: one stream owns a state dir
  * (foreachBatch serializes its merges); concurrent writers would lose
  * updates at the pointer swap. An out-of-order redelivery may regress
  * the version NAME, never the content — the re-merge is a superset of
  * the state it read.
  */
object KmvSegments {

  private def pointerPath(stateDir: Path) = new Path(stateDir, "current")

  /** The live state (`seg`, `kmv` array<long> asc), or None before the
    * first merge. Follows the `current` pointer; when the pointer is
    * mid-swap (deleted, not yet renamed — the one non-atomic instant),
    * falls back to the highest complete version on disk.
    */
  def state(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val dir = new Path(stateDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    liveVersion(fs, dir).map(v => spark.read.parquet(new Path(dir, v).toString))
  }

  private def liveVersion(fs: FileSystem, dir: Path): Option[String] =
    currentVersion(fs, dir).orElse(latestCompleteVersion(fs, dir))

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

  /** Crash recovery: the `v<N>` dir with the highest N that finished its
    * write (`_SUCCESS` present). A dir mid-write at the crash has no
    * `_SUCCESS` and is skipped.
    */
  private def latestCompleteVersion(fs: FileSystem, dir: Path): Option[String] = {
    if (!fs.exists(dir)) return None
    val ids = fs.listStatus(dir).map(_.getPath.getName).collect {
      case n if n.startsWith("v") && n.drop(1).forall(_.isDigit) &&
        fs.exists(new Path(new Path(dir, n), "_SUCCESS")) => n.drop(1).toLong
    }
    if (ids.isEmpty) None else Some(s"v${ids.max}")
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
    val vName = s"v$batchId"
    val vPath = new Path(dir, vName)
    val live = liveVersion(fs, dir)
    // the pointer is this batch's commit record: a redelivery whose
    // version is already live skips (idempotence: the state holds it) —
    // and never reads-and-overwrites its own version path
    if (live.contains(vName)) return spark.read.parquet(vPath.toString)
    val partial = Sketches.sketch(batch, segCol, keyCol, k)
      .withColumnRenamed(segCol, "seg")
    val empty = array().cast("array<bigint>")
    val merged = live match {
      case None => partial
      case Some(v) =>
        spark.read.parquet(new Path(dir, v).toString)
          .withColumnRenamed("kmv", "__prev")
          .join(partial.withColumnRenamed("kmv", "__new"), Seq("seg"), "full_outer")
          .select(col("seg"),
            Sketches.mergeCol(
              coalesce(col("__prev"), empty), coalesce(col("__new"), empty), k).as("kmv"))
    }
    // segments-sized state: one file per version is the right layout
    merged.coalesce(1).write.mode("overwrite").parquet(vPath.toString)
    val staging = new Path(dir, "current.staging")
    val out = fs.create(staging, true)
    try out.write(vName.getBytes("UTF-8")) finally out.close()
    val p = pointerPath(dir)
    // rename cannot overwrite -> delete first; a crash inside this window
    // leaves no pointer and state() recovers via latestCompleteVersion
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(staging, p))
      throw new graft.GraftDataError(s"kmv state: pointer swap failed under $dir")
    // sweep superseded versions EXCEPT the immediately-retired one (a
    // one-merge grace window for readers whose plan pins that directory)
    val keep = Set(vName) ++ live
    fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit) && !keep(n))
      .foreach(v => fs.delete(new Path(dir, v), true))
    spark.read.parquet(vPath.toString)
  }

  /** The stream form: each micro-batch merges and swaps, state readable
    * live via [[state]] / estimable via
    * [[graft.operators.Sketches.overlapMatrix]]. Pass `checkpointDir` in
    * production — the redelivery semantics the class doc reasons about
    * need the source offsets to survive a restart; without it Spark uses
    * a discard-on-stop temp checkpoint and a restarted query replays from
    * the source's beginning (content still converges, by idempotence, but
    * there is no recovery story).
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
