package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Continuous additive rollups: a per-key aggregate table (count, exact
  * decimal sum, min, max, HLL distinct sketch) maintained across
  * micro-batches — the incremental form of `GROUP BY` for the dashboard /
  * monitoring rollups a 100 TB pipeline reads constantly but must never
  * recompute from the corpus. Each batch contributes one partial
  * aggregation; the merge is a keys-sized full-outer combine (counts and
  * sums add, min/max fold, HLL sketches union), so nothing corpus-sized
  * is ever read back.
  *
  * KEYS-SIZED STATE is the contract: the key set must be dimension-like
  * (event types, domains, languages, days) — the state rewrites fully per
  * merge, which is the right trade exactly when |keys| ≪ |data|.
  *
  * Unlike [[KmvSegments]]' sketch merge, additive algebra is NOT
  * idempotent — a re-merged batch double-counts. Exactly-once therefore
  * rides [[VersionedState]]'s commit record: a redelivered batchId whose
  * version is live SKIPS. (Spark redelivers under the SAME batchId when a
  * checkpointed query restarts — pass `checkpointDir` in production.)
  *
  * Determinism: cnt/sum/min/max are order-free (decimal sums are exact;
  * the sum re-casts to DECIMAL(28,2) each merge so the state schema never
  * widens). The HLL sketch BINARY may vary with merge order; only its
  * estimate is contractual, within the lgK=14 envelope (~0.8% rse).
  */
object RollupState {

  private val SumType = "decimal(28,2)"

  private def partial(batch: DataFrame, keyCols: Seq[String], valueCol: String,
      distinctCol: String): DataFrame =
    batch.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sum(col(valueCol).cast("decimal(18,2)")).cast(SumType).as("sum_v"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"),
      hll_sketch_agg(col(distinctCol), lit(14)).as("distinct_hll"))

  private def unionHll(a: Column, b: Column): Column =
    when(a.isNull, b).when(b.isNull, a).otherwise(hll_union(a, b))

  /** The live rollup table, or None before the first merge. */
  def state(spark: SparkSession, stateDir: String): Option[DataFrame] =
    VersionedState.read(spark, stateDir)

  /** Merge one micro-batch's partial into the persisted rollup and swap it
    * live; a committed batchId skips (see class doc). Returns the new state.
    */
  def mergeBatch(batch: DataFrame, stateDir: String, keyCols: Seq[String],
      valueCol: String, distinctCol: String, batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    if (VersionedState.isCommitted(spark, stateDir, batchId))
      return VersionedState.read(spark, stateDir).get
    val p = partial(batch, keyCols, valueCol, distinctCol)
    val merged = state(spark, stateDir) match {
      case None => p
      case Some(prev) =>
        val a = prev.columns.filterNot(keyCols.contains)
          .foldLeft(prev)((d, c) => d.withColumnRenamed(c, s"__a_$c"))
        // NULL keys are groups too (groupBy emits them) and must keep
        // merging into ONE state row: a plain USING join's EqualTo never
        // matches NULL, so every batch would append a fresh null-key row
        // with split cnt/sum. Join null-safely (<=>) and coalesce the key
        // columns back out — for the null-key group both sides are null
        // and the coalesce correctly stays null.
        val ak = keyCols.foldLeft(a)((d, c) => d.withColumnRenamed(c, s"__k_$c"))
        val b = ak.join(p,
          keyCols.map(c => col(s"__k_$c") <=> col(c)).reduce(_ && _), "full_outer")
        b.select(keyCols.map(c => coalesce(col(s"__k_$c"), col(c)).as(c)) ++ Seq(
          (coalesce(col("__a_cnt"), lit(0L)) + coalesce(col("cnt"), lit(0L))).as("cnt"),
          (coalesce(col("__a_sum_v"), lit(0).cast(SumType)) +
            coalesce(col("sum_v"), lit(0).cast(SumType))).cast(SumType).as("sum_v"),
          least(col("__a_min_v"), col("min_v")).as("min_v"),
          greatest(col("__a_max_v"), col("max_v")).as("max_v"),
          unionHll(col("__a_distinct_hll"), col("distinct_hll")).as("distinct_hll")): _*)
    }
    VersionedState.commit(merged, stateDir, batchId, coalesceTo = 1)
  }

  /** The stream form; `checkpointDir` keeps batchIds stable across
    * restarts, which the exactly-once skip depends on. Starting against
    * already-committed state with re-numbering batchIds (no checkpoint,
    * or a fresh one) fails fast — see
    * [[VersionedState.requireStreamSafe]].
    */
  def stream(events: DataFrame, stateDir: String, keyCols: Seq[String],
      valueCol: String, distinctCol: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    VersionedState.requireStreamSafe(events.sparkSession, stateDir,
      checkpointDir, "RollupState")
    val w = events.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, stateDir, keyCols, valueCol, distinctCol, batchId): Unit
      }
    checkpointDir.fold(w)(c => w.option("checkpointLocation", c)).start()
  }
}
