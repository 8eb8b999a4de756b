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

  test("triangleCounts: K4 is all-triangles, a pendant vertex has none") {
    // K4 + a pendant (4-5): each K4 vertex sits in C(3,2)=3 triangles with
    // clustering 1.0; the pendant and its anchor gain degree but no triangle
    val nodes = (1L to 5L).toDF("id")
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val r = Graph.triangleCounts(sym((k4 :+ (4L, 5L)): _*), nodes)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((3L, 3L, 1.0)) && r(2L) == ((3L, 3L, 1.0)) && r(3L) == ((3L, 3L, 1.0)))
    assert(r(4L)._1 == 3L && r(4L)._2 == 4L && r(4L)._3 == 0.5, s"anchor: ${r(4L)}")
    assert(r(5L) == ((0L, 1L, 0.0)), "pendant: degree 1, no triangle, coeff 0")
  }

  test("triangleCounts: orientation never double-counts, any edge direction mix accepted") {
    val nodes = (0L to 3L).toDF("id")
    // one triangle given with mixed/duplicated orientations + a self-loop
    val messy = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 0L), (2L, 2L), (0L, 2L)).toDF("a", "b")
    val r = Graph.triangleCounts(messy, nodes)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("triangleCounts is deterministic across partitionings") {
    val nodes = (0L until 30L).toDF("id")
    val ring = (0L until 30L).map(i => (i, (i + 1) % 30)) ++ (0L until 30L).map(i => (i, (i + 2) % 30))
    def run(parts: Int) =
      Graph.triangleCounts(sym(ring: _*).repartition(parts), nodes)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3))).sortBy(_._1).toSeq
    assert(run(2) == run(17))
    // every ring vertex closes exactly 3 triangles (i-1,i,i+1), (i,i+1,i+2), (i-2,i-1,i)... = 3
    assert(run(2).forall(_._2 == 3L))
  }

  test("triangleCounts: empty edge list yields all-zero rows for every node") {
    val nodes = (0L to 2L).toDF("id")
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val r = Graph.triangleCounts(empty, nodes)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3))).sortBy(_._1)
    assert(r.toSeq == Seq((0L, 0L, 0L, 0.0), (1L, 0L, 0L, 0.0), (2L, 0L, 0L, 0.0)))
  }
}
