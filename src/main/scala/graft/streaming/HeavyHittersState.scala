package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Continuous heavy hitters: a per-group Misra-Gries summary (plus the
  * group's exact stream length `n_tokens`) maintained across micro-batches
  * — "which tokens are frequent in each language, RIGHT NOW" answerable at
  * any moment from groups×capacity-sized state, against a token stream
  * that itself is never re-scannable at 100 TB.
  *
  * Each batch reduces map-side to one <= capacity-counter summary per
  * group ([[graft.operators.Sketches.MisraGriesAgg]]); the cross-batch
  * merge is the SAME mergeable-summaries cut-merge (Agarwal et al.,
  * PODS'12 — [[graft.operators.Sketches.mgCutMerge]]), so the three
  * order-independent guarantees survive any batch split and any merge
  * order, with N the TOTAL stream length across all batches:
  *   - estimate(k) <= true(k);
  *   - true(k) - estimate(k) <= N / (capacity + 1);
  *   - every item with true(k) > N / (capacity + 1) is present.
  * The summary CONTENT may differ from a one-shot build — only the
  * guarantees are contractual (same contract as the batch aggregate).
  *
  * Merge algebra is NON-idempotent (counters add — a re-merged batch
  * inflates counts and `n_tokens`), so exactly-once rides
  * [[VersionedState]]'s commit record exactly like [[RollupState]]: a
  * redelivered batchId whose version is live SKIPS. State stays
  * groups-sized: |groups| rows × (<= capacity map entries + one long),
  * independent of how much stream has flowed.
  */
object HeavyHittersState {

  /** The live state (`group`, `hh` map<string,bigint>, `n_tokens`), or
    * None before the first merge.
    */
  def state(spark: SparkSession, stateDir: String): Option[DataFrame] =
    VersionedState.read(spark, stateDir)

  private def mgMerge(capacity: Int): UserDefinedFunction =
    udf { (a: Map[String, Long], b: Map[String, Long]) =>
      Sketches.mgCutMerge(Option(a).getOrElse(Map.empty),
        Option(b).getOrElse(Map.empty), capacity)
    }

  /** Merge one micro-batch into the persisted per-group summaries and swap
    * the state live; a committed batchId skips (see class doc). NULL
    * tokens are dropped (they are not countable keys); a NULL group is a
    * group like any other. Returns the new state.
    */
  def mergeBatch(batch: DataFrame, stateDir: String, groupCol: String,
      tokenCol: String, capacity: Int, batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    if (VersionedState.isCommitted(spark, stateDir, batchId))
      return VersionedState.read(spark, stateDir).get
    val mg = udaf(new Sketches.MisraGriesAgg(capacity),
      org.apache.spark.sql.Encoders.STRING)
    val partial = batch.filter(col(tokenCol).isNotNull)
      .groupBy(col(groupCol).as("group"))
      .agg(mg(col(tokenCol)).as("hh"), count(lit(1)).as("n_tokens"))
    val merged = state(spark, stateDir) match {
      case None => partial
      case Some(prev) =>
        // null-safe on group (the USING-join NULL split RollupState documents)
        prev.withColumnsRenamed(
            Map("group" -> "__pg", "hh" -> "__ph", "n_tokens" -> "__pn"))
          .join(partial, col("__pg") <=> col("group"), "full_outer")
          .select(coalesce(col("__pg"), col("group")).as("group"),
            mgMerge(capacity)(col("__ph"), col("hh")).as("hh"),
            (coalesce(col("__pn"), lit(0L)) + coalesce(col("n_tokens"), lit(0L)))
              .as("n_tokens"))
    }
    VersionedState.commit(merged, stateDir, batchId, coalesceTo = 1)
  }

  /** The dashboard read: the live state exploded to one row per
    * (group, token) with its estimate, the group's stream length, the
    * guarantee threshold n_tokens/(capacity+1), and the per-group rank —
    * top `k` per group by estimate (token-lexicographic tiebreak, so the
    * view is deterministic GIVEN a state). Summary CONTENT is
    * merge-order-dependent (class doc), so consumers rank and threshold,
    * never diff exact estimates across differently-batched runs; rows at
    * `est > threshold` are the guaranteed heavy hitters. State is
    * groups×capacity-sized, so this is a driver-cheap view, no corpus
    * read anywhere.
    */
  def topK(spark: SparkSession, stateDir: String, k: Int,
      capacity: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val st = state(spark, stateDir).getOrElse(
      throw new graft.GraftDataError(s"no heavy-hitters state at $stateDir"))
    val exploded = st.select(col("group"), col("n_tokens"),
        explode(col("hh")).as(Seq("token", "est")))
      .withColumn("threshold",
        col("n_tokens").cast("double") / lit((capacity + 1).toDouble))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group")).orderBy(col("est").desc, col("token"))
    exploded
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("group"), col("token"), col("est"), col("rank"),
        col("n_tokens"), col("threshold"),
        (col("est").cast("double") > col("threshold")).as("guaranteed"))
  }

  /** The stream form; `checkpointDir` keeps batchIds stable across
    * restarts, which the exactly-once skip depends on (same contract as
    * [[RollupState.stream]]). Starting against already-committed state
    * with re-numbering batchIds (no checkpoint, or a fresh one) fails
    * fast — see [[VersionedState.requireStreamSafe]].
    */
  def stream(tokens: DataFrame, stateDir: String, groupCol: String,
      tokenCol: String, capacity: Int,
      checkpointDir: Option[String] = None): StreamingQuery = {
    VersionedState.requireStreamSafe(tokens.sparkSession, stateDir,
      checkpointDir, "HeavyHittersState")
    val w = tokens.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, stateDir, groupCol, tokenCol, capacity, batchId): Unit
      }
    checkpointDir.fold(w)(c => w.option("checkpointLocation", c)).start()
  }
}
