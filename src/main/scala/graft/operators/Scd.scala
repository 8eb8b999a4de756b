package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history building — the warehouse-side
  * versioning step downstream of the reference's DWH upsert loaders
  * (services/sources/implementations/dwh/postgresql_service.py:117-296
  * keeps only the latest row per key; SCD2 keeps every version with
  * validity intervals). Two forms: derive a full history from a change
  * log, and merge an update batch into an existing history.
  *
  * Scale shape: everything is ONE shuffle on the dimension key followed by
  * partitioned-window passes (lag for change detection, lead for interval
  * closing) — the windows share the partitioning, so the exchange is paid
  * once. No global window, no self-join. The merge form re-derives only
  * the AFFECTED keys' history (semi/anti-join pruned — broadcast when the
  * batch's key set is small) and passes untouched keys through unchanged.
  */
object Scd {

  /** Shared derivation: collapse no-change observations, then close the
    * half-open `[valid_from, valid_to)` intervals. `order` must totally
    * order each key's observations (ties included) or the collapse is
    * nondeterministic. Zero-length versions — two changes at the same
    * instant — are elided: the later observation replaces the earlier one
    * at that instant (keep-last, the reference upsert's convention), and
    * the surviving intervals still tile exactly.
    */
  private def derive(
      changes: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      attrCols: Seq[String],
      order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc +: order: _*)
    val attrs = struct(attrCols.map(col): _*)
    val versions = changes
      .withColumn("__prev", lag(attrs, 1).over(w))
      // null-safe: a change TO null and a change FROM null both open versions
      .filter(!(attrs <=> col("__prev")))
      .drop("__prev")
    versions
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .filter(col("valid_to").isNull || col("valid_to") =!= col("valid_from"))
      .withColumn("is_current", when(col("valid_to").isNull, 1L).otherwise(0L))
      .select((keyCols ++ attrCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Build a Type-2 history from a change log: one row per (key, ts)
    * observation, collapsed so that only genuine attribute CHANGES open a
    * new version (re-observing the same values extends the current version
    * instead of splitting it). `tieCol` totally orders simultaneous
    * observations of one key, and the later observation wins the instant.
    */
  def scd2FromChangeLog(
      changes: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "keys and attrs must be non-empty")
    derive(changes, keyCols, tsCol, attrCols, Seq(col(tieCol).asc))
  }

  /** Merge an update batch into an existing Type-2 history: versions of
    * keys absent from the batch pass through untouched; for affected keys
    * the history is re-derived from its own change points plus the batch,
    * so late-arriving and no-change updates resolve exactly like a full
    * rebuild would (merge-then-rebuild equivalence is the correctness
    * contract, and what the spec asserts). At the same timestamp a batch
    * row outranks the existing version (keep-last); within the batch,
    * `tieCol` breaks ties. `history` must hold at most one version per
    * (key, valid_from) — the natural SCD2 invariant.
    */
  def scd2Merge(
      history: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "keys and attrs must be non-empty")
    val affectedKeys = updates.select(keyCols.map(col): _*).distinct()
    val untouched = history.join(affectedKeys, keyCols, "left_anti")
    // existing versions back to change-log form; the batch sorts after the
    // history row at an equal timestamp (__src), batch-internal ties break
    // on the tie column (string-cast: any total order works — it only has
    // to be deterministic, and history/batch never compare on it)
    val histLog = history.join(affectedKeys, keyCols, "left_semi")
      .select((keyCols ++ attrCols).map(col) :+ col("valid_from").as(tsCol): _*)
      .withColumn("__src", lit(0L))
      .withColumn("__tie", lit(null).cast("string"))
    val batchLog = updates
      .select((keyCols ++ attrCols).map(col) ++
        Seq(col(tsCol), col(tieCol).cast("string").as("__tie")): _*)
      .withColumn("__src", lit(1L))
    untouched.unionByName(
      derive(histLog.unionByName(batchLog), keyCols, tsCol, attrCols,
        Seq(col("__src").asc, col("__tie").asc)))
  }
}
