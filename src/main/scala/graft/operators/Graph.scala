package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge-list DataFrames. Connected
  * components (pointer doubling) lives in [[Dedup.connectedComponents]]
  * where the dedup pipelines consume it; this object holds the iterative
  * linear-algebra side — the centrality signal a curation run reads off the
  * duplication/co-occurrence structure (a document at the center of a dense
  * near-dup neighborhood is boilerplate-shaped even when no single pair
  * crosses a dedup threshold).
  */
object Graph {

  /** Fixed-point scale for rank-contribution accumulation: 2^40. Power-of-
    * two multiply + floor are IEEE-exact, and the resulting long sums are
    * order-free — the same determinism construction as
    * [[Similarity.trainCodebook]], for the same reason: a naive double sum
    * would make the ranks partitioning-dependent (and unmirrorable).
    * Contributions are ≤ 1, so per-node sums stay ≤ 2^40 — no overflow at
    * any in-degree that fits a long.
    */
  private val FixedPoint = 1099511627776.0

  /** PageRank with a fixed iteration count, deterministic at any
    * parallelism. `edges` is a DIRECTED edge list (a → b); symmetrize
    * before calling for an undirected graph. `nodes` declares the full
    * vertex set (one `id` column) so isolated vertices keep receiving the
    * teleport mass instead of vanishing from the result.
    *
    * Semantics: Pregel-style simplification — dangling mass (vertices with
    * no out-edges) is dropped, not redistributed, and per-iteration ranks
    * are not renormalized. Fixed `iters` rather than a convergence test:
    * the output is a deterministic function of the input, which is what an
    * exact oracle (and a reproducible curation run) needs.
    *
    * Scale shape: the edge list joins its out-degrees ONCE and is
    * locally checkpointed — an iterative consumer must materialize its
    * adjacency or every iteration re-derives the upstream lineage (here:
    * the full shingle explode, per iteration, compounding). Each iteration
    * is then one equi-join on the source vertex + one hash aggregation on
    * the destination — the canonical distributed PageRank step; nothing
    * reaches the driver but the vertex count.
    */
  def pageRank(
      edges: DataFrame,
      nodes: DataFrame,
      iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    val deg = edges.groupBy(col("a")).agg(count(lit(1)).as("__deg"))
    val adj = edges.select(col("a"), col("b"))
      .join(deg, Seq("a"))
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty vertex set")
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
    var it = 0
    while (it < iters) {
      val contribs = adj
        .join(ranks.select(col("id").as("a"), col("rank")), Seq("a"))
        .select(col("b"),
          floor(col("rank") / col("__deg") * lit(FixedPoint)).cast("long").as("__q"))
        .groupBy(col("b")).agg(sum(col("__q")).as("__qs"))
      ranks = nodes
        .join(contribs.select(col("b").as("id"), col("__qs")), Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("__qs"), lit(0L)).cast("double") / lit(FixedPoint)))
            .as("rank"))
      it += 1
    }
    ranks
  }
}
