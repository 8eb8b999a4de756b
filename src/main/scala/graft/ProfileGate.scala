package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Ad-hoc stage-by-stage timing of the incremental NEAR-dup gate and the
  * composed curation pipelines (bench diagnosis for the round's slowest
  * queries).
  */
object ProfileGate {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("profile-gate")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warmup")(docs.count())
    val corpus = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    (1 to 2).foreach { i =>
      time(s"gate only run$i")(
        Dedup.incrementalMinhash(corpus, batch, "doc_id", "text").count())
    }
    // stage isolation
    (1 to 2).foreach { i =>
      val corpFeat = time(s"corpFeat materialize run$i")(
        Dedup.nearDupFeatures(corpus, "doc_id", "text", 3, 64, 42L)
          .transform(Checkpointing.materialize))
      time(s"bloom build run$i") {
        corpFeat.select(explode(
          Dedup.bandProbeKeysFromSig(col("__sig"), 64, 16)).as("__k"))
          .agg(graft.functions.SketchFunctions.bloomFilterAgg(col("__k"), 1000000L).as("bf"))
          .head().getAs[Array[Byte]]("bf")
      }
      time(s"batchFeat equivalent run$i")(
        Dedup.nearDupFeatures(batch, "doc_id", "text", 3, 64, 42L)
          .transform(Checkpointing.materialize).count())
    }
    (1 to 2).foreach { i =>
      time(s"full query (gate + invariants) run$i")(
        SparkEntry.queries("incremental_minhash_dedup")(spark, dir).count())
    }
    (1 to 4).foreach { i =>
      time(s"curation_pipeline_v3 run$i")(
        SparkEntry.queries("curation_pipeline_v3")(spark, dir).count())
    }
    // v3 stage isolation
    import graft.operators.{Dedup => D, TextAnalysis => TA}
    val cls = TA.classifierScore(docs).filter(col("margin") > 0.0).select("doc_id")
    val lm = TA.bigramLmScore(docs).filter(col("avg_bigram_p") >= 0.033).select("doc_id")
    (1 to 2).foreach { i =>
      val gated = time(s"v3 gates materialize run$i")(
        docs.join(cls, Seq("doc_id"), "left_semi")
          .join(lm, Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("text"), col("lang"))
          .transform(Checkpointing.materialize))
      time(s"v3 span excision run$i")(
        D.removeDuplicateSpans(gated, "doc_id", "text", k = 8, carryCols = Seq("lang"))
          .filter(col("n_tokens") - col("removed_tokens") >= 2).count())
    }
    (1 to 2).foreach { i =>
      time(s"curation_pipeline_v2 run$i")(
        SparkEntry.queries("curation_pipeline_v2")(spark, dir).count())
    }
    (1 to 2).foreach { i =>
      time(s"entity_resolution run$i")(
        SparkEntry.queries("entity_resolution")(spark, dir).count())
    }
    spark.stop()
  }
}
