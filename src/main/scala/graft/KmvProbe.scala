package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Diagnostic: measured KMV estimate error vs exact, per fixture and k.
  *
  * Prints, for the `kmv_overlap` segment pair (purchase vs view, value >
  * 120), the exact and estimated cardinalities of each segment, their
  * union, and their intersection at k ∈ {64, 128} across all three
  * fixtures. This is how the query's 30% envelope was calibrated: at k=128
  * the worst observed error is ≤1.2% at sf0.01 and ≤16% at sf0.1 (the
  * segments share most users, so their sketch errors are correlated —
  * single-draw errors land above the i.i.d. rse of 1/sqrt(k-2) ≈ 8.9%,
  * still well inside the 3σ bound the oracle states).
  *
  * Run: sbt "runMain graft.KmvProbe"
  */
object KmvProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("kmv-probe")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1");
         k <- Seq(64, 128)) {
      val ev = Tables.events(spark, sf)
        .filter(col("event_type").isin("purchase", "view") && col("value") > 120)
        .select(col("event_type").as("seg"), col("user_id"))
        .distinct()
      val sk = Sketches.sketch(ev, "seg", "user_id", k)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val a = sk("purchase"); val b = sk("view")
      val exactA = ev.filter(col("seg") === "purchase").count()
      val exactB = ev.filter(col("seg") === "view").count()
      val both = ev.groupBy("user_id").agg(collect_set("seg").as("s"))
        .filter(size(col("s")) === 2).count()
      val (uEst, iEst) = Sketches.overlap(a, b, k)
      val estA = Sketches.estimate(a, k); val estB = Sketches.estimate(b, k)
      val exactU = exactA + exactB - both
      println(f"sf=$sf%s k=$k%d  A: exact=$exactA%d est=$estA%.1f err=${(estA-exactA)/exactA*100}%.1f%%  " +
        f"B: exact=$exactB%d est=$estB%.1f err=${(estB-exactB)/exactB*100}%.1f%%  " +
        f"U: exact=$exactU%d est=$uEst%.1f err=${(uEst-exactU)/exactU*100}%.1f%%  " +
        f"I: exact=$both%d est=$iEst%.1f err=${if (both>0) (iEst-both)/both*100 else 0.0}%.1f%%")
    }
    spark.stop()
  }
}
