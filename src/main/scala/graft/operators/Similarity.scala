package graft.operators

import graft.functions.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a single scan + TakeOrderedAndProject
  * (Spark's distributed top-k: per-partition heaps, k-sized merge at the
  * driver), which IS the right plan at any scale when every vector must be
  * scored. Scale path: IVF — a coarse quantizer restricts scoring to the
  * nprobe nearest lists; assignment is a shuffle-free projection against a
  * broadcast codebook.
  */
object Similarity {

  private def vecLit(v: Array[Float]): Column = typedlit(v.toSeq)

  private[graft] def cosineLocal(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Brute-force cosine top-k for one query vector. The scoring kernel is the
    * codegen'd [[VectorExpressions.CosineSimilarity]]; orderBy+limit plans as
    * TakeOrderedAndProject (no global sort).
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String, query: Array[Float], k: Int): DataFrame =
    Ops.spread(corpus.select(col(idCol), col(vecCol)))
      .select(col(idCol), VectorExpressions.cosine(col(vecCol), vecLit(query)).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)

  final case class Scored(id: Long, score: Double)

  /** Bounded top-k aggregator: the buffer never exceeds 2k entries, so the
    * map-side partial aggregation reduces each partition to at most k rows
    * per query BEFORE the shuffle — the window-function formulation
    * (row_number over the full scored set) shuffles every scored row.
    * Deterministic: ties on score break by ascending id.
    */
  class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def best(xs: Seq[Scored]): Seq[Scored] =
      xs.sortBy(s => (-s.score, s.id)).take(k)
    override def zero: Seq[Scored] = Vector.empty
    override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] = {
      val appended = buf :+ a
      if (appended.length > 2 * k) best(appended) else appended
    }
    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] = best(b1 ++ b2)
    override def finish(buf: Seq[Scored]): Seq[Scored] = best(buf)
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Batched top-k: every query row gets its k nearest corpus rows. The query
    * side broadcasts (it is small by construction); scoring happens in the
    * corpus scan stage; the bounded [[TopKAgg]] keeps the shuffle at
    * O(partitions x queries x k) rows regardless of corpus size.
    */
  def topKJoin(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k), Encoders.product[Scored])
    Ops.spread(corpus.select(col(corpusId), col(corpusVec))).crossJoin(broadcast(queries))
      .select(
        col(queryId), col(corpusId).as("__cid"),
        VectorExpressions.cosine(col(corpusVec), col(queryVec)).as("__score"))
      .groupBy(col(queryId))
      .agg(topk(col("__cid"), col("__score")).as("__top"))
      .select(col(queryId), explode(col("__top")).as("__s"))
      .select(col(queryId), col("__s.id").as(corpusId), col("__s.score").as("score"))
  }

  /** The IVF coarse quantizer: a small driver-side codebook, k-means-trained
    * on a bounded sample (see [[ivfIndex]]).
    */
  final case class IvfModel(centroids: Array[Array[Float]]) {
    def nearestLists(query: Array[Float], nprobe: Int): Seq[Int] =
      centroids.indices
        .sortBy(i => (-cosineLocal(query, centroids(i)), i))
        .take(nprobe)
  }

  /** Argmax-cosine assignment against double centroids; ties break to the
    * lowest index (mirrors [[VectorKernels.nearestCentroid]] and the oracle's
    * `row_number ... ORDER BY cos DESC, cidx`).
    */
  private def nearestIdxD(v: Array[Float], cents: Array[Array[Double]]): Int = {
    var best = -1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cen = cents(c)
      val n = math.min(v.length, cen.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = v(i).toDouble; val y = cen(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val sim = if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  /** Deterministic Lloyd refinement of the codebook over a bounded sample
    * (ascending-id order). Every arithmetic step is chosen to be exactly
    * reproducible in the DuckDB oracle: assignments are argmax cosine with
    * lowest-index ties, per-dimension means accumulate in DOUBLE in sample
    * id order (= DuckDB `list_sum(list(x ORDER BY id))`), division happens in
    * double, empty clusters keep their previous centroid, and only the FINAL
    * centroids round to float (IEEE round-to-nearest-even in both engines).
    */
  private[graft] def trainCodebook(
      sample: Array[Array[Float]],
      init: Array[Array[Float]],
      iters: Int): Array[Array[Float]] = {
    var cents: Array[Array[Double]] = init.map(_.map(_.toDouble))
    var it = 0
    while (it < iters) {
      val dim = if (cents.nonEmpty) cents(0).length else 0
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      sample.foreach { v =>
        val c = nearestIdxD(v, cents)
        counts(c) += 1L
        var d = 0
        val n = math.min(dim, v.length)
        while (d < n) { sums(c)(d) += v(d).toDouble; d += 1 }
      }
      cents = Array.tabulate(cents.length) { c =>
        if (counts(c) == 0L) cents(c)
        else sums(c).map(_ / counts(c))
      }
      it += 1
    }
    cents.map(_.map(_.toFloat))
  }

  /** Build the IVF index. The codebook is k-means-trained (FAISS-style: the
    * coarse quantizer trains on a bounded sample, NOT the full corpus — the
    * sample and the nlist-sized codebook are the only driver-side data, so
    * the build stays O(sample) on the driver at any corpus size) from a
    * deterministic stride sample, initialized with stride-spaced seeds.
    * Every corpus vector is then tagged with its nearest centroid via the
    * codegen'd [[VectorExpressions.NearestCentroid]] projection — NO join,
    * NO shuffle; at cluster scale the assignment is a single map stage and
    * the index is written `partitionBy("centroid_id")` so probes prune to
    * nprobe/nlist of the files.
    */
  def ivfIndex(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 2, sampleMax: Int = 256): (DataFrame, IvfModel) = {
    val n = corpus.count()
    def strideSample(target: Int): Array[Array[Float]] = {
      val stride = math.max(1L, n / target)
      corpus.filter(pmod(col(idCol), lit(stride)) === 0)
        .orderBy(col(idCol))
        .limit(target)
        .select(col(vecCol))
        .collect()
        .map(_.getSeq[Float](0).toArray)
    }
    val init = strideSample(nlist)
    val sample = strideSample(sampleMax)
    val centroids = trainCodebook(sample, init, iters)
    val model = IvfModel(centroids)
    val assignments = Ops.spread(corpus.select(col(idCol), col(vecCol))).select(
      col(idCol), col(vecCol),
      VectorExpressions.nearestCentroid(col(vecCol), centroids).as("centroid_id"))
    (assignments, model)
  }

  /** Persist the IVF index partitioned by centroid id — the 100 TB layout:
    * each inverted list is a directory, so a probe's `centroid_id IN (...)`
    * filter becomes PARTITION pruning and the scan reads nprobe/nlist of the
    * files instead of filtering all of them.
    */
  def writeIvfIndex(assignments: DataFrame, dir: String): Unit =
    assignments.write.mode("overwrite").partitionBy("centroid_id").parquet(dir)

  /** Probe a persisted IVF index: identical semantics to [[ivfTopK]], but the
    * centroid filter prunes whole directories at planning time.
    */
  def ivfTopKFromIndex(
      spark: SparkSession, indexDir: String, model: IvfModel,
      idCol: String, vecCol: String,
      query: Array[Float], k: Int, nprobe: Int): DataFrame =
    ivfTopK(spark.read.parquet(indexDir), model, idCol, vecCol, query, k, nprobe)

  /** IVF probe: rank centroids against the query on the driver (the codebook
    * is tiny), then brute-force only inside the `nprobe` nearest lists — an
    * IN-filter the scan prunes on.
    */
  def ivfTopK(
      assignments: DataFrame, model: IvfModel,
      idCol: String, vecCol: String,
      query: Array[Float], k: Int, nprobe: Int): DataFrame = {
    val probeLists = model.nearestLists(query, nprobe)
    assignments
      .filter(col("centroid_id").isin(probeLists: _*))
      .select(col(idCol), VectorExpressions.cosine(col(vecCol), vecLit(query)).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
