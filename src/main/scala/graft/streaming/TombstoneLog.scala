package graft.streaming

import graft.Checkpointing
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batched right-to-be-forgotten for content-gated corpora: purge REQUESTS
  * append to a KB-scale tombstone log; the corpus-sized rewrite
  * ([[Streaming.purgeCorpus]] → [[CorpusCompaction.rewrite]]) runs ONCE
  * for N pending requests, when a threshold or age trigger fires. Without
  * this, a compliant operator under a realistic trickle of daily requests
  * either rewrites the whole corpus per request or hand-rolls exactly
  * this queue — the engine now enforces the batching its own
  * purge Scaladoc prescribes.
  *
  * Read-side compliance BEFORE the physical purge: [[readCompliant]]
  * anti-joins the pending log (ids-sized, broadcastable) onto the corpus,
  * so downstream consumers can honor a request the moment it lands while
  * the physical rewrite waits for its batch.
  *
  * Layout: `<corpus>/_tombstones/t<n>/` — one tiny parquet dir per
  * request (underscore-prefixed parent: invisible to corpus reads), `n`
  * monotonic. A request dir is live once its `_SUCCESS` lands; a
  * crash-torn request has none and is ignored (the requester retries).
  *
  * Crash windows (single MAINTAINER per corpus, like every sidecar here;
  * requests themselves are just appends):
  *   - crash mid-request: no `_SUCCESS` → invisible; swept at next flush;
  *   - crash between the purge and the log retire: the log survives, the
  *     next flush re-purges (the purge's no-op fast path — tombstoned ids
  *     already absent — makes this one cheap semi-join) and then retires;
  *   - ids purged twice across requests: distinct-ed before the purge,
  *     and the purge itself is idempotent.
  */
object TombstoneLog {

  val DirName = "_tombstones"

  private def logDir(corpusDir: Path) = new Path(corpusDir, DirName)

  private def fileSystem(spark: SparkSession, corpusDir: String): (FileSystem, Path) = {
    val dir = new Path(corpusDir)
    (dir.getFileSystem(spark.sparkContext.hadoopConfiguration), dir)
  }

  private def entryName(n: Long) = s"t$n"

  private def allEntries(fs: FileSystem, corpusDir: Path): Seq[Path] = {
    val d = logDir(corpusDir)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).map(_.getPath).toSeq
      .filter(p => p.getName.length > 1 && p.getName.startsWith("t") &&
        p.getName.drop(1).forall(_.isDigit))
  }

  private def completeEntries(fs: FileSystem, corpusDir: Path): Seq[Path] =
    allEntries(fs, corpusDir)
      .filter(p => fs.exists(new Path(p, "_SUCCESS")))
      .sortBy(_.getName.drop(1).toLong)

  /** Append one purge request: a KB-scale parquet write of the distinct
    * non-null ids — NEVER a corpus read. Returns the entry name.
    */
  def requestPurge(corpusDir: String, ids: DataFrame, idCol: String): String = {
    val spark = ids.sparkSession
    val (fs, dir) = fileSystem(spark, corpusDir)
    val d = logDir(dir)
    fs.mkdirs(d)
    // next = max over ALL entries (complete or torn) so a crashed write's
    // number is never reused under a reader's feet
    val next = allEntries(fs, dir)
      .map(_.getName.drop(1).toLong).foldLeft(-1L)(math.max) + 1L
    val name = entryName(next)
    ids.select(col(idCol)).na.drop().distinct().coalesce(1)
      .write.mode("overwrite").parquet(new Path(d, name).toString)
    name
  }

  /** All pending tombstoned ids (complete requests only), distinct; an
    * empty frame with the corpus id type when the log is empty.
    */
  def pending(spark: SparkSession, corpusDir: String, idCol: String): DataFrame = {
    val (fs, dir) = fileSystem(spark, corpusDir)
    val entries = completeEntries(fs, dir)
    if (entries.isEmpty)
      spark.read.parquet(corpusDir).select(col(idCol)).limit(0)
    else
      spark.read.parquet(entries.map(_.toString): _*)
        .select(col(idCol)).distinct()
  }

  /** The corpus with pending tombstones already excluded — read-side
    * compliance the moment a request lands, ahead of the physical purge.
    * The pending side is ids-sized (broadcastable at any corpus scale).
    */
  def readCompliant(spark: SparkSession, corpusDir: String, idCol: String): DataFrame =
    spark.read.parquet(corpusDir)
      .join(broadcast(pending(spark, corpusDir, idCol)), Seq(idCol), "left_anti")

  /** Flush the log: ONE [[Streaming.purgeCorpus]] for every pending
    * request, then retire exactly the request dirs that were read (plus
    * torn leftovers). Triggers: pending distinct ids >= `minPending`, OR
    * the oldest pending request is older than `maxAgeMs` (mtime-based).
    * Returns None (log kept, nothing touched) when neither fires or the
    * log is empty; otherwise the purge stats and the number of requests
    * retired.
    */
  def flushPurge(spark: SparkSession, corpusDir: String, idCol: String,
      contentCols: Seq[String], minPending: Long = 1L,
      maxAgeMs: Long = Long.MaxValue): Option[(Streaming.CorpusPurgeStats, Int)] = {
    val (fs, dir) = fileSystem(spark, corpusDir)
    val entries = completeEntries(fs, dir)
    if (entries.isEmpty) return None
    val ids = spark.read.parquet(entries.map(_.toString): _*)
      .select(col(idCol)).distinct()
      .transform(Checkpointing.materialize)
    val n = ids.count()
    val oldest = entries.map(e => fs.getFileStatus(e).getModificationTime).min
    val due = n >= minPending || (System.currentTimeMillis() - oldest) >= maxAgeMs
    if (!due) return None
    val stats = Streaming.purgeCorpus(spark, corpusDir, ids, idCol, contentCols)
    // retire AFTER the purge: a crash above leaves the log intact and the
    // re-flush idempotent. Torn (no-_SUCCESS) leftovers sweep here too.
    val retire = entries ++ (allEntries(fs, dir).toSet -- entries.toSet)
    retire.foreach(e => fs.delete(e, true))
    Some((stats, entries.size))
  }
}
