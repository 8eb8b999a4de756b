package graft

import graft.operators.Anonymity
import org.apache.spark.sql.functions._

/** Release-side anonymity: suppression yields a k-anonymous table by
  * construction, the census agrees with the window path, banding is
  * floor-consistent for negatives, and the shipped query's flags replay.
  */
class AnonymitySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val cust = Tables.customer(spark, sfDir)
  private val qi = Seq("c_nationkey", "c_mktsegment")

  test("suppressBelowK releases a k-anonymous table by construction") {
    // a single-column QI at the sf0.001 row count (15 customers, 5
    // segments) gives classes on BOTH sides of k=3
    val k = 3
    val seg = Seq("c_mktsegment")
    val released = Anonymity.suppressBelowK(cust, seg, k)
    assert(released.count() > 0, "the fixture must keep at least one class")
    val minClass = released.groupBy(seg.map(col): _*).agg(count(lit(1)).as("n"))
      .select(min($"n")).head().getLong(0)
    assert(minClass >= k, s"released class of $minClass < $k")
    // suppression drops EXACTLY the below-k classes' rows, nothing else
    val expected = Anonymity.census(cust, seg, col("c_acctbal"))
      .filter($"class_size" >= k).agg(sum($"class_size")).head().getLong(0)
    assert(released.count() == expected)
  }

  test("census and the window annotation agree class by class") {
    val viaWindow = Anonymity.withClassSize(cust, qi)
      .select((qi.map(col) :+ col("class_size")): _*).distinct()
    val viaCensus = Anonymity.census(cust, qi, col("c_acctbal"))
      .select((qi.map(col) :+ col("class_size")): _*)
    assert(viaWindow.exceptAll(viaCensus).isEmpty && viaCensus.exceptAll(viaWindow).isEmpty)
  }

  test("class-size columns never clobber caller data") {
    val withIt = cust.withColumn("class_size", lit(42))
    intercept[IllegalArgumentException] {
      Anonymity.withClassSize(withIt, qi)
    }
    // suppressBelowK picks a collision-free temp name instead
    val trap = cust.withColumn("__kanon_class_size", lit(-1))
    val out = Anonymity.suppressBelowK(trap, Seq("c_mktsegment"), 1)
    assert(out.columns.contains("__kanon_class_size"), "caller column must survive")
    assert(out.select("__kanon_class_size").distinct().head().getInt(0) == -1)
  }

  test("band generalizes negatives onto the floor grid") {
    val got = Seq(-1.0, -2000.0, -2000.5, 0.0, 1999.9, 2000.0)
      .toDF("x").select(Anonymity.band($"x", 2000.0).as("b"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(-2000.0, -2000.0, -4000.0, 0.0, 0.0, 2000.0))
  }

  test("k_anonymity query: flags match a recount; l_diversity bounded by class_size") {
    val rows = SparkEntry.queries("k_anonymity")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("class_size"); val l = r.getAs[Long]("l_diversity")
      assert(l >= 1 && l <= n, r.toString)
      assert(r.getAs[Long]("releasable_k10") == (if (n >= 10) 1L else 0L))
    }
  }
}
