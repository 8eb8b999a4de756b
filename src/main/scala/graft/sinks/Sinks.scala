package graft.sinks

import graft.types._
import graft.functions.Registry
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sink registry (SURVEY.md §2.11). The reference selects a loader strategy
  * by name at runtime (K3, `postgresql_service.py:92-115`); here the registry
  * is a plain map of writer builders. The bench environment has no Postgres,
  * so the COPY/TSV and upsert paths are realized against files with the same
  * semantics; on a cluster the same DataFrames go to `.jdbc` /
  * `foreachPartition`+CopyManager unchanged.
  */
object Sinks {

  /** K1-parity TSV sink: tab-separated text, empty string as NULL (the COPY
    * `NULL ''` contract, reference `postgresql_service.py:167-170`), values
    * sanitized of tabs/newlines (F3). One file per partition — the
    * distributed analog of the per-batch COPY buffer.
    */
  def writeTsv(df: DataFrame, path: String): Unit = {
    val sanitized = df.columns.foldLeft(df) { (d, c) =>
      d.withColumn(c, Registry.sanitizeTsv(col(c).cast("string")))
    }
    sanitized.write
      .mode(SaveMode.Overwrite)
      .option("sep", "\t")
      .option("header", "true")
      .option("emptyValue", "")
      .option("nullValue", "")
      .csv(path)
  }

  /** Plain columnar sink. */
  def writeParquet(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  /** Columnar ORC sink (format breadth: some warehouses standardize on ORC;
    * Spark's reader/writer is native and codegen'd like parquet's).
    */
  def writeOrc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Range-clustered write: range-repartition then sort within partitions on
    * the given columns before writing. Every output file then covers a tight
    * key range, so parquet row-group min/max statistics actually prune range
    * predicates — on a 100 TB time-ordered table this is the difference
    * between reading the queried window and testing every row group. (The
    * single-dimension analog of Z-ordering; one shuffle at write time,
    * amortized over every later scan.)
    */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String]): Unit =
    df.repartitionByRange(sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style partitioned layout (the S5/A1 `{type: {date: [...]}}`
    * grouping as a directory tree): downstream scans with predicates on the
    * partition columns prune whole directories — the 100 TB idiom for
    * anything consumed by time- or category-restricted queries.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed table write: co-locates rows by key so joins and aggregations
    * between tables bucketed on the same key by the same count plan WITHOUT
    * a shuffle — pre-paying the exchange once at write time, the right trade
    * for fact tables joined repeatedly at scale. (Bucketing requires the
    * table catalog, hence saveAsTable rather than a path write.)
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String], numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** K4 — timestamped write + `latest` alias (reference `s3_service.py:44-61`):
    * the run's output lands under a run-stamped directory and `latest` is
    * atomically repointed (rewritten) at it.
    */
  def writeVersioned(df: DataFrame, baseDir: String, runId: String): (String, String) = {
    val runPath = s"$baseDir/$runId"
    df.write.mode(SaveMode.ErrorIfExists).parquet(runPath)
    val latest = s"$baseDir/latest"
    df.sparkSession.read.parquet(runPath).write.mode(SaveMode.Overwrite).parquet(latest)
    (runPath, latest)
  }

  /** K2 — upsert emulation over parquet (no transactional store in the bench
    * env; SURVEY.md §7.4.4): `ON CONFLICT (keys) DO UPDATE` = keep incoming
    * row on key collision, `DO NOTHING` = keep existing row. Implemented as
    * anti-join + union — both sides shuffle once on the conflict key; small
    * incoming batches broadcast automatically under AQE.
    */
  def upsert(
      existing: DataFrame,
      incoming: DataFrame,
      conflictColumns: Seq[String],
      action: ConflictAction): DataFrame = {
    val keys = conflictColumns
    action match {
      case ConflictUpdate =>
        // incoming wins: drop existing rows whose key collides, then union
        existing.join(incoming.select(keys.map(col): _*).distinct(), keys, "left_anti")
          .unionByName(dedupIncoming(incoming, keys))
      case ConflictNothing =>
        // existing wins: only genuinely new keys come in
        existing.unionByName(
          dedupIncoming(incoming, keys).join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti"))
    }
  }

  /** Within one incoming batch the reference's INSERT applies rows in order,
    * so the last row per key wins under DO UPDATE; emulate with a keep-last
    * window when an ordering column exists, else arbitrary-but-deterministic
    * first by all-column order.
    */
  private def dedupIncoming(incoming: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val orderCols = incoming.columns.filterNot(keys.contains).map(col).toSeq
    if (orderCols.isEmpty) incoming.distinct()
    else {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(_.desc): _*)
      incoming.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
    }
  }

  /** K6 — checkpoint/metadata write (reference
    * `internal_raw_to_dwh/standard_pipeline.py:117-124`): one row per run,
    * stamped with a run-scoped current-time value (F8 — evaluated once on the
    * driver, not per executor row, matching the reference's single INSERT).
    * Written only after the data action succeeds; a skipped run (missing
    * source) never calls this, so the watermark cannot advance past
    * unprocessed data.
    */
  def writeCheckpoint(
      spark: SparkSession,
      path: String,
      runValues: Map[String, String]): Unit = {
    import spark.implicits._
    val now = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .format(java.time.LocalDateTime.now(java.time.ZoneOffset.UTC))
    val row = (runValues + ("current_time" -> now)).toSeq.sortBy(_._1)
    val df = Seq(row.map(_._2)).toDF("values")
      .select(row.map(_._1).zipWithIndex.map { case (name, i) => col("values")(i).as(name) }: _*)
    df.write.mode(SaveMode.Append).parquet(path)
  }
}
