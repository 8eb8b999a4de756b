package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Diagnostic: measured KMV overlap-MATRIX estimate error vs exact, per
  * fixture — the calibration record behind `kmv_matrix`'s envelope flags.
  *
  * Prints, for the value-band segment set (`floor(value/50) <= 4` over
  * events, keyed by user_id), every pair's exact intersection and the
  * sketch estimate at k=128. Observed: exact at sf0.001 (unsaturated),
  * ≤3.7% at sf0.01, ≤26.5% at sf0.1 — the fixture's user-id hash draw
  * sits ~2.7σ high (doubling k to 256 does NOT shrink it: the error is
  * the fixed population's draw, not estimator variance), hence the 40%
  * intersection envelope.
  *
  * Run: sbt "runMain graft.MatrixProbe"
  */
object MatrixProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("matrix-probe")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1");
         k <- Seq(128, 256)) {
      val segs = Tables.events(spark, sf)
        .select(floor(col("value") / lit(50.0)).cast("long").as("seg"), col("user_id"))
        .filter(col("seg") <= 4)
      val sk = Sketches.sketch(segs, "seg", "user_id", k)
      val m = Sketches.overlapMatrix(sk, "seg", k)
      val exact = segs.distinct().as("x").join(segs.distinct().as("y"), "user_id")
        .filter(col("x.seg") < col("y.seg"))
        .groupBy(col("x.seg").as("seg_a"), col("y.seg").as("seg_b"))
        .agg(count(lit(1)).as("exact_i"))
      val j = m.join(exact, Seq("seg_a", "seg_b")).orderBy("seg_a", "seg_b").collect()
      println(s"--- $sf k=$k")
      j.foreach { r =>
        val ei = r.getAs[Double]("est_intersect"); val ex = r.getAs[Long]("exact_i")
        println(f"  ${r.getLong(0)}x${r.getLong(1)} exact=$ex%d est=$ei%.1f relerr=${(ei - ex) / ex * 100}%.1f%%")
      }
    }
    spark.stop()
  }
}
