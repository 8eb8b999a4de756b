package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** One row of [[Packing.packGreedy]]'s prepared input. */
final case class PackInput(group: String, id: Long, n_tokens: Long)

/** One packed assignment: `bin_id` is the 0-based bin within the group. */
final case class PackAssignment(group: String, id: Long, n_tokens: Long, bin_id: Long)

/** Sequence packing: assign documents to fixed token-budget bins (training
  * context windows) so each bin fills close to the budget — the step between
  * curation and tokenization in an LLM data pipeline.
  *
  * The rule is GREEDY SEQUENTIAL within a group: documents are visited in
  * ascending id order and a document opens a new bin exactly when it does not
  * fit in the current one (a document alone larger than the budget gets its
  * own bin). Sequential packing is deliberately chosen over first-fit-
  * decreasing: it is deterministic, single-pass, streaming-friendly, and
  * keeps id-adjacent documents co-packed, at a small fill-rate cost.
  *
  * Scale shape: packing is inherently sequential PER GROUP, so the group is
  * the unit of parallelism. One shuffle on the group key brings each group to
  * one task (`repartition` + `sortWithinPartitions`), then a single
  * stateful pass assigns bins. Groups at the 100 TB scale are (lang, shard)
  * pairs — pass a composite `groupCol` (e.g. `concat(lang, '-', pmod(id, n))`)
  * to bound the per-task row count; bins never cross shards by construction.
  */
object Packing {

  /** Pack each group's rows into token-budget bins.
    *
    * @param df        input rows
    * @param groupCol  packing scope (bins never span groups); shuffle key
    * @param idCol     total order within the group (the greedy visit order)
    * @param tokensCol token count per row (any integral expression)
    * @param budget    bin capacity in tokens
    * @return (group, id, n_tokens, bin_id) — one row per input row
    */
  def packGreedy(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      tokensCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val ss = df.sparkSession
    import ss.implicits._
    val prepped = df
      .select(
        col(groupCol).cast("string").as("group"),
        col(idCol).cast("long").as("id"),
        tokensCol.cast("long").as("n_tokens"))
      .repartition(col("group"))
      .sortWithinPartitions(col("group"), col("id"))
      .as[PackInput]
    // one sequential pass per partition; state resets at group boundaries
    // (hash partitioning may co-locate several groups in one partition, but
    // never splits one across two)
    prepped.mapPartitions { it =>
      var curGroup: String = null
      var bin = 0L
      var acc = 0L
      it.map { r =>
        if (r.group != curGroup) {
          curGroup = r.group; bin = 0L; acc = 0L
        }
        if (acc > 0L && acc + r.n_tokens > budget) {
          bin += 1L; acc = r.n_tokens
        } else {
          acc += r.n_tokens
        }
        PackAssignment(r.group, r.id, r.n_tokens, bin)
      }
    }.toDF()
  }

  /** Per-bin roll-up of [[packGreedy]]: fill statistics per (group, bin). */
  def binStats(assignments: DataFrame, budget: Long): DataFrame =
    assignments
      .groupBy(col("group"), col("bin_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bin_tokens"))
      .withColumn("fill_frac", col("bin_tokens").cast("double") / lit(budget.toDouble))
}
