package graft.operators

import graft.Checkpointing
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
    * checkpointed via [[graft.Checkpointing]] (local by default, reliable
    * DFS on preemptible clusters) — an iterative consumer must materialize its
    * adjacency or every iteration re-derives the upstream lineage (here:
    * the full shingle explode, per iteration, compounding). Each iteration
    * is then one equi-join on the source vertex + one hash aggregation on
    * the destination — the canonical distributed PageRank step; nothing
    * reaches the driver but the vertex count.
    */
  /** Per-vertex triangle counts + local clustering coefficient over an
    * undirected graph given as an edge list (either or both orientations;
    * self-loops and duplicates are dropped).
    *
    * Scale shape: the naive wedge join (all 2-paths through a middle
    * vertex) materializes Σ deg² intermediates — a single celebrity vertex
    * in a power-law graph makes that quadratic. The standard fix (degree
    * orientation): direct every edge toward its higher-(degree, id)
    * endpoint, enumerate wedges only from OUT-edges, and close them against
    * the directed list. Out-degrees are bounded by O(√m), so wedge volume
    * is O(m^1.5) on ANY degree distribution — each triangle found exactly
    * once, as its lowest-ordered vertex's out-wedge. Everything is
    * equi-joins on vertex keys: AQE-splittable shuffles, no driver state.
    *
    * Clustering coefficient = 2·T / (deg·(deg−1)) for deg ≥ 2, else 0 —
    * one IEEE double division per vertex, mirrorable exactly.
    *
    * Returns (id, triangles, degree, clustering) for every vertex in
    * `nodes` (vertices without edges report 0/0/0.0).
    */
  def triangleCounts(edges: DataFrame, nodes: DataFrame): DataFrame = {
    // materialize the canonical edge list once: the degree census, the
    // orientation join AND the final left-join all scan it, and the edge
    // derivation upstream (for the document graph: a full shingle explode +
    // df cut) must not re-run per consumer — at corpus scale the repeated
    // lineage dominates, the local-rig delta sits inside the noise band
    val und = edges
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .transform(Checkpointing.materialize)
    val deg = und.select(col("u").as("id"))
      .unionAll(und.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("__deg"))
    // orient u→v toward the higher-(degree, id) endpoint; carry the order
    // key so the wedge join can sort its two spokes without another join
    val dir = und
      .join(deg.select(col("id").as("u"), col("__deg").as("__du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("__deg").as("__dv")), Seq("v"))
      .select(
        when(col("__du") < col("__dv") ||
          (col("__du") === col("__dv") && col("u") < col("v")), struct(col("u").as("x"), col("v").as("y"), col("__dv").as("__dy")))
          .otherwise(struct(col("v").as("x"), col("u").as("y"), col("__du").as("__dy")))
          .as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"), col("e.__dy").as("__dy"))
      .transform(Checkpointing.materialize) // wedge + closure joins both scan it; derive once
    // wedges (y ← x → z) with ord(y) < ord(z); close against the directed
    // edge (y, z) — present iff the triangle exists, counted exactly once
    val wedges = dir.select(col("x"), col("y"), col("__dy"))
      .join(dir.select(col("x"), col("y").as("z"), col("__dy").as("__dz")), Seq("x"))
      .filter(col("__dy") < col("__dz") ||
        (col("__dy") === col("__dz") && col("y") < col("z")))
    // the spoke pair (y, z) is ord-sorted and the orientation rule directs
    // every edge low→high, so the closing edge can only appear as y→z
    val triangles = wedges
      .join(dir.select(col("x").as("yy"), col("y").as("y2")),
        col("y") === col("yy") && col("z") === col("y2"))
      .select(col("x"), col("y"), col("z"))
    val perNode = triangles
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    nodes.select(col("id"))
      .join(deg, Seq("id"), "left")
      .join(perNode, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        coalesce(col("__deg"), lit(0L)).as("degree"),
        when(coalesce(col("__deg"), lit(0L)) >= 2,
          (lit(2.0) * coalesce(col("triangles"), lit(0L))) /
            (col("__deg") * (col("__deg") - 1)))
          .otherwise(lit(0.0)).as("clustering"))
  }

  def pageRank(
      edges: DataFrame,
      nodes: DataFrame,
      iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    val deg = edges.groupBy(col("a")).agg(count(lit(1)).as("__deg"))
    val adj = edges.select(col("a"), col("b"))
      .join(deg, Seq("a"))
      .transform(Checkpointing.materialize)
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
