package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def sym(pairs: (Long, Long)*): org.apache.spark.sql.DataFrame = {
    val df = pairs.toDF("a", "b")
    df.unionByName(df.select($"b".as("a"), $"a".as("b")))
  }

  test("pageRank: symmetric pair splits mass evenly, star centers concentrate it") {
    val nodes = (0L to 4L).toDF("id")
    // star: 0 at the center of 1..4
    val star = sym((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L))
    val r = Graph.pageRank(star, nodes, iters = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(0L) > r(1L) * 2, "the hub outranks every leaf decisively")
    assert(Seq(1L, 2L, 3L, 4L).map(r).distinct.size == 1, "symmetric leaves tie exactly")
    // ranks stay a (sub-)distribution: dangling mass may leak, never grow
    assert(r.values.sum <= 1.0 + 1e-9 && r.values.sum > 0.5)
  }

  test("pageRank: isolated vertices keep the teleport mass, never vanish") {
    val nodes = (0L to 3L).toDF("id")
    val r = Graph.pageRank(sym((0L, 1L)), nodes, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.size == 4, "every declared vertex appears")
    assert(r(2L) > 0.0 && r(2L) == r(3L), "isolated vertices hold (1-d)/N")
    assert(r(0L) == r(1L) && r(0L) > r(2L))
  }

  test("pageRank is bitwise deterministic across partitionings (fixed-point sums)") {
    val nodes = (0L until 40L).toDF("id")
    val edges = sym((0L until 39L).map(i => (i, i + 1)): _*)
    def run(parts: Int): Seq[(Long, Double)] =
      Graph.pageRank(edges.repartition(parts), nodes.repartition(parts), iters = 5)
        .collect().map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1).toSeq
    assert(run(2) == run(13), "rank doubles must agree to the last bit")
  }
}
