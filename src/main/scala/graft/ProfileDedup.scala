package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Ad-hoc stage-by-stage timing of the LSH dedup path (bench diagnosis). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("profile")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warmup")(docs.count())
    time("minhashLsh")(Dedup.minhashLsh(docs, "doc_id", "text").count())
    time("minhashLsh 2nd")(Dedup.minhashLsh(docs, "doc_id", "text").count())
    time("ngramJaccard")(Dedup.ngramJaccard(docs, "doc_id", "text").count())
    time("simhash")(Dedup.simhash(docs, "doc_id", "text").count())
    (1 to 2).foreach { i =>
      time(s"q:minhash_dedup_docs run$i")(
        SparkEntry.queries("minhash_dedup_docs")(spark, dir).count())
    }
    (1 to 2).foreach { i =>
      time(s"q:token_fingerprint run$i")(
        SparkEntry.queries("token_fingerprint")(spark, dir).count())
    }
    val emb = Tables.embeddings(spark, dir)
    time("emb warmup")(emb.count())
    (1 to 2).foreach { i =>
      time(s"embeddingCosine run$i")(
        Dedup.embeddingCosine(emb, "vec_id", "embedding", dim = 64).count())
    }
    // stage isolation: sign-bit projection alone
    import graft.functions.VectorExpressions
    val planes = Dedup.hyperplanes(32, 64)
    val signBits = planes.toSeq.zipWithIndex.map { case (p, i) =>
      when(VectorExpressions.dot(col("embedding"), typedlit(p.toSeq)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    (1 to 2).foreach { i =>
      time(s"signs only run$i")(
        graft.operators.Ops.spread(emb.select(col("vec_id"), col("embedding")))
          .select(col("vec_id"), signBits.as("s")).agg(sum("s")).count())
    }
    spark.stop()
  }
}
