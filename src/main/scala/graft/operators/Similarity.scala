package graft.operators

import graft.functions.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a single scan + TakeOrderedAndProject
  * (Spark's distributed top-k: per-partition heaps, k-sized merge at the
  * driver), which IS the right plan at any scale when every vector must be
  * scored. Scale path: IVF — a coarse quantizer restricts scoring to the
  * nprobe nearest partitions, trading recall for a ~nlist/nprobe scan cut.
  */
object Similarity {

  private def vecLit(v: Array[Float]): Column = typedlit(v.toSeq)

  /** Brute-force cosine top-k for one query vector. The scoring kernel is the
    * codegen'd [[VectorExpressions.CosineSimilarity]]; orderBy+limit plans as
    * TakeOrderedAndProject (no global sort).
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String, query: Array[Float], k: Int): DataFrame =
    corpus
      .select(col(idCol), VectorExpressions.cosine(col(vecCol), vecLit(query)).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)

  /** Batched top-k: every query row gets its k nearest corpus rows. The query
    * side broadcasts (it is small by construction); scoring happens in the
    * corpus scan stage; ranking is one window shuffle on the query id.
    */
  def topKJoin(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(
        col(queryId), col(corpusId),
        VectorExpressions.cosine(col(corpusVec), col(queryVec)).as("score"))
    val w = Window.partitionBy(col(queryId)).orderBy(col("score").desc, col(corpusId).asc)
    scored.withColumn("__rank", row_number().over(w)).filter(col("__rank") <= k).drop("__rank")
  }

  /** IVF index: pick `nlist` deterministic centroid rows (stride sample — on
    * real data a k-means pass would refine these; the partition/probe
    * machinery is identical), assign every corpus vector to its nearest
    * centroid. Returns (assignments, centroids). The assignment join
    * broadcasts the centroid table — the corpus never shuffles.
    */
  def ivfIndex(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int): (DataFrame, DataFrame) = {
    val n = corpus.count()
    val stride = math.max(1L, n / nlist)
    val centroids = corpus
      .filter(pmod(col(idCol), lit(stride)) === 0)
      .limit(nlist)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))
    val assigned = corpus.crossJoin(broadcast(centroids))
      .withColumn("__sim", VectorExpressions.cosine(col(vecCol), col("centroid_vec")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__sim").desc, col("centroid_id").asc)
    val assignments = assigned
      .withColumn("__rank", row_number().over(w)).filter(col("__rank") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id"))
    (assignments, centroids)
  }

  /** IVF probe: score the query against centroids, keep the `nprobe` nearest
    * lists, then brute-force only inside those lists. Partition the
    * assignments by centroid_id on write (or bucket them) and the probe scan
    * prunes to nprobe/nlist of the data.
    */
  def ivfTopK(
      assignments: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String,
      query: Array[Float], k: Int, nprobe: Int): DataFrame = {
    val q = vecLit(query)
    val probeLists = centroids
      .select(col("centroid_id"), VectorExpressions.cosine(col("centroid_vec"), q).as("__csim"))
      .orderBy(col("__csim").desc, col("centroid_id").asc)
      .limit(nprobe)
      .select("centroid_id")
    assignments
      .join(broadcast(probeLists), Seq("centroid_id"), "left_semi")
      .select(col(idCol), VectorExpressions.cosine(col(vecCol), q).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
