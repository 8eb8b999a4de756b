package graft

import graft.functions.VectorExpressions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("cosine/dot/l2norm expressions match scalar math (eval + codegen paths)") {
    val a = Array(1f, 2f, 3f)
    val b = Array(4f, 5f, 6f)
    val df = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
    val row = df.select(
      VectorExpressions.dot($"a", $"b").as("dot"),
      VectorExpressions.cosine($"a", $"b").as("cos"),
      VectorExpressions.l2norm($"a").as("na")).head()
    val expDot = (a zip b).map { case (x, y) => x.toDouble * y }.sum
    val expNa = math.sqrt(a.map(x => x.toDouble * x).sum)
    val expNb = math.sqrt(b.map(x => x.toDouble * x).sum)
    assert(math.abs(row.getDouble(0) - expDot) < 1e-12)
    assert(math.abs(row.getDouble(1) - expDot / (expNa * expNb)) < 1e-12)
    assert(math.abs(row.getDouble(2) - expNa) < 1e-12)
  }

  test("cosine handles zero vectors and null inputs") {
    val df = Seq(
      (Some(Seq(0f, 0f)), Some(Seq(1f, 0f))),
      (None: Option[Seq[Float]], Some(Seq(1f, 0f)))
    ).toDF("a", "b")
    val rows = df.select(VectorExpressions.cosine($"a", $"b").as("c")).collect()
    assert(rows(0).getDouble(0) == 0.0)
    assert(rows(1).isNullAt(0))
  }

  test("brute-force top-k ranks the query vector itself first with score ~1") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" === 7).select("embedding").head().getSeq[Float](0).toArray
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5).collect()
    assert(top.length == 5)
    assert(top.head.getLong(0) == 7L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
    val scores = top.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse, "descending scores")
  }

  test("topKJoin returns exactly k neighbors per query, self first") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val out = Similarity.topKJoin(emb, "vec_id", "embedding", queries, "query_id", "query_vec", 4)
    val grouped = out.groupBy("query_id").agg(count(lit(1)).as("n")).collect()
    assert(grouped.forall(_.getLong(1) == 4L))
    val self = out.filter($"query_id" === $"vec_id").count()
    assert(self == 3L, "each query's own vector is among its top-k")
  }

  test("persisted IVF index prunes partitions on probe and matches the in-memory result") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" === 5).select("embedding").head().getSeq[Float](0).toArray
    val (assignments, model) = Similarity.ivfIndex(emb, "vec_id", "embedding", nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/index"
    Similarity.writeIvfIndex(assignments, dir)

    val fromIndex = Similarity.ivfTopKFromIndex(spark, dir, model, "vec_id", "embedding", q, k = 10, nprobe = 2)
    val inMemory = Similarity.ivfTopK(assignments, model, "vec_id", "embedding", q, k = 10, nprobe = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows(fromIndex) == rows(inMemory) && rows(fromIndex).nonEmpty)

    // the probe's centroid filter must prune DIRECTORIES, not just rows
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      s"probe should partition-prune:\n$plan")
    // the on-disk layout is one directory per inverted list, so pruning to
    // nprobe lists reads a strict subset of directories
    val listDirs = new java.io.File(dir).list().count(_.startsWith("centroid_id="))
    assert(listDirs > 2, s"expected one directory per non-empty list, got $listDirs")
  }

  test("persisted IVF-PQ index prunes partitions and reads only codes") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" === 5).select("embedding").head().getSeq[Float](0).toArray
    val (index, ivf, pq) = Similarity.ivfPqIndex(emb, "vec_id", "embedding",
      dim = 64, nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString + "/index"
    Similarity.writeIvfIndex(index, dir) // same centroid_id layout: one dir per list
    val persisted = spark.read.parquet(dir)
    val fromIndex = Similarity.ivfPqTopK(persisted, ivf, pq, "vec_id", q, k = 10, nprobe = 2)
    val inMemory = Similarity.ivfPqTopK(index, ivf, pq, "vec_id", q, k = 10, nprobe = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows(fromIndex) == rows(inMemory) && rows(fromIndex).nonEmpty)
    // directory pruning + a code-only ReadSchema: the probe reads 8-byte
    // codes, never floats — both prunings visible in the scan node
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      s"probe should partition-prune:\n$plan")
    assert(!plan.contains("embedding"),
      s"the ADC probe must not read the float column:\n$plan")
  }

  test("k-means-trained codebook reaches recall@10 >= 0.9 at nprobe=4 vs brute force") {
    // clustered corpus: 16 gaussian centers + small noise. (The testdata
    // embeddings are UNIFORM random vectors — pairwise cosine tops out ~0.4 —
    // so no codebook can pin a query's true neighbors into 4 of 16 lists
    // there; codebook QUALITY is only measurable where clusters exist.)
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val points = (0L until 400L).map { i =>
      val c = centers((i % 16).toInt)
      (i, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    }
    val emb = points.toDF("vec_id", "embedding")
    val (assignments, model) = Similarity.ivfIndex(emb, "vec_id", "embedding", nlist = 16)
    val recalls = Seq(0L, 5L, 42L, 137L, 233L, 311L).map { qid =>
      val q = emb.filter($"vec_id" === qid).select("embedding").head().getSeq[Float](0).toArray
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      val approx = Similarity.ivfTopK(assignments, model, "vec_id", "embedding", q, k = 10, nprobe = 4)
        .collect().map(_.getLong(0)).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"recall@10 per query $recalls, mean $mean")
    // the Lloyd iterations must genuinely move the codebook off its seeds
    val (_, seedModel) = Similarity.ivfIndex(emb, "vec_id", "embedding", nlist = 16, iters = 0)
    assert(model.centroids.zip(seedModel.centroids).exists { case (a, b) => !a.sameElements(b) },
      "trained codebook should differ from the first-id seeds")
  }

  test("distributed Lloyd at nlist=64 on the full corpus keeps recall@10 >= 0.9") {
    // 64 gaussian clusters, seed order scrambled (i*7 % 64) so the first-64
    // seeding does NOT hand each seed its own cluster in order — the
    // distributed iterations have to do the refinement
    val rnd = new scala.util.Random(11)
    val dim = 16
    val centers = Array.fill(64)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val points = (0L until 1280L).map { i =>
      val c = centers(((i * 7) % 64).toInt)
      (i, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    }
    val emb = points.toDF("vec_id", "embedding").repartition(8)
    val (assignments, model) = Similarity.ivfIndex(emb, "vec_id", "embedding", nlist = 64)
    assert(model.centroids.length == 64)
    val recalls = Seq(3L, 77L, 411L, 905L, 1203L).map { qid =>
      val q = points(qid.toInt)._2.toArray
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      val approx = Similarity.ivfTopK(assignments, model, "vec_id", "embedding", q, k = 10, nprobe = 8)
        .collect().map(_.getLong(0)).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"recall@10 per query $recalls, mean $mean")
  }

  test("codebook is bitwise identical at any parallelism (fixed-point sums)") {
    // double addition is not associative: a naive sum(x) codebook would
    // depend on partitioning. The fixed-point accumulation must not.
    val emb = Tables.embeddings(spark, sfDir)
    val (_, m1) = Similarity.ivfIndex(emb.repartition(1), "vec_id", "embedding", nlist = 8)
    val (_, m13) = Similarity.ivfIndex(emb.repartition(13), "vec_id", "embedding", nlist = 8)
    m1.centroids.zip(m13.centroids).foreach { case (a, b) =>
      assert(a.sameElements(b), "centroids diverged across partitionings")
    }
  }

  test("ivfIndex runs no count() pre-pass (seed-only build is a single collect)") {
    val emb = Tables.embeddings(spark, sfDir)
    val sc = spark.sparkContext
    def jobsFor(group: String)(body: => Unit): Int = {
      sc.setJobGroup(group, group, interruptOnCancel = false)
      try body finally sc.clearJobGroup()
      val deadline = System.nanoTime() + 5_000_000_000L
      var jobs = sc.statusTracker.getJobIdsForGroup(group).length
      while (jobs == 0 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        jobs = sc.statusTracker.getJobIdsForGroup(group).length
      }
      jobs
    }
    // iters=0 isolates the pre-pass: the only action is the seed collect
    // (TakeOrderedAndProject, <=2 jobs under AQE). The removed count() +
    // stride-sample collects were 3+ jobs here.
    val seedOnly = jobsFor("ivf-seed") {
      Similarity.ivfIndex(emb, "vec_id", "embedding", nlist = 8, iters = 0)
    }
    assert(seedOnly >= 1 && seedOnly <= 2, s"seed-only build should be one collect, saw $seedOnly jobs")
  }

  test("int8 quantized top-k tracks the float brute force (recall@10 >= 0.8)") {
    val emb = Tables.embeddings(spark, sfDir)
    val recalls = Seq(0L, 7L, 42L).map { qid =>
      val q = emb.filter($"vec_id" === qid).select("embedding").head().getSeq[Float](0).toArray
      // dot-product ranking on both sides (quantization approximates the DOT,
      // not the cosine; corpus norms vary so compare like with like)
      val exact = Similarity.bruteForceDotTopK(emb, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      val approx = Similarity.quantizedTopK(emb, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"quantized recall@10 per query $recalls, mean $mean")
  }

  test("quantizeLocal mirrors the QuantizeVec kernel bit-for-bit") {
    import org.apache.spark.sql.functions.{col, typedlit}
    val vecs = Seq(
      (0L, Seq(0.5f, -1.0f, 0.25f, 0.0f)),
      (1L, Seq(-0.001f, 0.002f, -0.003f, 0.004f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)) // zero vector -> all-zero codes
    ).toDF("vec_id", "embedding")
    val kernel = vecs.select(col("vec_id"),
      graft.functions.VectorExpressions.quantizeVec(col("embedding")).as("q"),
      graft.functions.VectorExpressions.quantScale(col("embedding")).as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Byte](1).toSeq, r.getDouble(2)))).toMap
    Seq(
      0L -> Array(0.5f, -1.0f, 0.25f, 0.0f),
      1L -> Array(-0.001f, 0.002f, -0.003f, 0.004f),
      2L -> Array(0.0f, 0.0f, 0.0f, 0.0f)
    ).foreach { case (id, arr) =>
      val (codes, scale) = Similarity.quantizeLocal(arr)
      assert(kernel(id)._1 == codes.toSeq, s"codes for $id")
      assert(kernel(id)._2 == scale, s"scale for $id")
    }
    // codes bounded and the extreme component hits the scale exactly
    assert(kernel(0L)._1.forall(c => c >= -127 && c <= 127))
    assert(kernel(0L)._1(1) == -127.toByte)
    assert(kernel(2L)._1.forall(_ == 0))
  }

  test("IVF probe finds the query vector when probing enough lists") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" === 12).select("embedding").head().getSeq[Float](0).toArray
    val (assignments, model) = Similarity.ivfIndex(emb, "vec_id", "embedding", nlist = 8)
    assert(assignments.count() == emb.count(), "every vector assigned to exactly one list")
    assert(assignments.select("centroid_id").distinct().count() <= 8)
    val top = Similarity.ivfTopK(assignments, model, "vec_id", "embedding", q, k = 5, nprobe = 8)
      .collect()
    assert(top.head.getLong(0) == 12L, "with nprobe = nlist the scan is exhaustive -> exact result")
    // fewer probes must still find the query vector in its own list
    val top1 = Similarity.ivfTopK(assignments, model, "vec_id", "embedding", q, k = 5, nprobe = 1)
      .collect()
    assert(top1.map(_.getLong(0)).contains(12L))
  }

  test("clusterProfile partitions the corpus and bounds cohesion to [-1, 1]") {
    val emb = Tables.embeddings(spark, sfDir)
    val profile = Similarity.clusterProfile(emb, "vec_id", "embedding", nlist = 16)
      .collect()
    assert(profile.map(_.getLong(1)).sum == emb.count(),
      "cluster sizes partition the corpus exactly")
    assert(profile.map(_.getLong(0)).forall(c => c >= 0 && c < 16))
    assert(profile.forall(r => r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0 + 1e-9),
      "mean cosine-to-centroid is a cosine mean")
    // tightest sanity: a cluster's members are on average closer to their
    // own centroid than random (> 0 overall for non-degenerate codebooks)
    assert(profile.map(_.getDouble(2)).sum / profile.length > 0.0)
  }

  test("clusterBalancedSample caps every cluster and is reproducible") {
    val emb = Tables.embeddings(spark, sfDir)
    val sample = Similarity.clusterBalancedSample(
      emb, "vec_id", "embedding", nlist = 16, perCluster = 8)
    val perCluster = sample.groupBy("centroid_id").agg(count(lit(1)).as("n")).collect()
    assert(perCluster.forall(_.getLong(1) <= 8L), "no cluster exceeds the cap")
    val ids = sample.select("vec_id").as[Long].collect().toSet
    val again = Similarity.clusterBalancedSample(
      emb, "vec_id", "embedding", nlist = 16, perCluster = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(ids == again, "hash-ordered selection is deterministic")
    // a different salt draws a genuinely different sample
    val salted = Similarity.clusterBalancedSample(
      emb, "vec_id", "embedding", nlist = 16, perCluster = 8, salt = 7L)
      .select("vec_id").as[Long].collect().toSet
    assert(ids != salted)
  }

  test("knnClassify takes the majority label of the k nearest, deterministically") {
    // two tight clusters on orthogonal axes: labels are unambiguous, so the
    // vote must be unanimous for a query inside either cluster
    def around(axis: Int, n: Int, base: Long): Seq[(Long, Seq[Float], Int)] =
      (0 until n).map { i =>
        val v = Array.fill(4)(0.01f * (i % 3))
        v(axis) = 1f
        (base + i, v.toSeq, axis)
      }
    val corpus = (around(0, 12, 100L) ++ around(1, 12, 200L))
      .toDF("vec_id", "embedding", "label")
    val queries = Seq(
      (0L, Seq(0.9f, 0.05f, 0f, 0f)),
      (1L, Seq(0.05f, 0.9f, 0f, 0f))).toDF("query_id", "query_vec")
    val out = Similarity.knnClassify(
      corpus, "vec_id", "embedding", "label", queries, "query_id", "query_vec", k = 5)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out(0L) == ((0, 5L)), "axis-0 query: unanimous label 0")
    assert(out(1L) == ((1, 5L)), "axis-1 query: unanimous label 1")
    // exact 50/50 vote splits must break to the SMALLEST label: a query
    // equidistant from both clusters with k=2 sees one neighbor of each
    val tieCorpus = Seq(
      (1L, Seq(1f, 0f), 3), (2L, Seq(0f, 1f), 1)).toDF("vec_id", "embedding", "label")
    val tieQuery = Seq((9L, Seq(1f, 1f))).toDF("query_id", "query_vec")
    val tie = Similarity.knnClassify(
      tieCorpus, "vec_id", "embedding", "label", tieQuery, "query_id", "query_vec", k = 2)
      .head()
    assert(tie.getInt(1) == 1 && tie.getLong(2) == 1L)
  }

  test("jlProject: deterministic, distance-preserving in expectation, codegen = interpreted") {
    import graft.functions.{VectorExpressions, VectorKernels}
    val emb = Tables.embeddings(spark, sfDir).limit(50)
    val a = Similarity.jlProject(emb, "vec_id", "embedding", k = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = Similarity.jlProject(emb.repartition(7), "vec_id", "embedding", k = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b, "projection must be bitwise partition-independent")
    assert(a.values.forall(_.size == 8))
    // kernel agrees with a direct sequential replay of the sign formula
    val one = emb.filter(col("vec_id") === 1).select("embedding").head().getSeq[Float](0)
    val d = one.size
    val expected = (0 until 8).map { i =>
      var s = 0.0
      for (j <- 0 until d) {
        val r = (1103515245L * (i.toLong * d + j) + 12345L) & 0x7FFFFFFFL
        s += (if (r >= 1073741824L) one(j).toDouble else -one(j).toDouble)
      }
      s
    }
    assert(a(1L) == expected, "LCG sign matrix replay must match the kernel exactly")
  }

  test("jlTopK: self is nearest at distance zero; shortlist ranks by projected L2") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val top = Similarity.jlTopK(emb, "vec_id", "embedding", q, k = 10, projDim = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.head == ((0L, 0.0)), "the query vector is its own nearest neighbor, exactly")
    assert(top.map(_._2).toSeq == top.map(_._2).sorted.toSeq, "ascending distance")
    assert(top.length == 10)
  }

  // ------------------------------------------------------------------ PQ

  test("pqEncode packs the per-subspace argmax codes (local replay, all in range)") {
    val rnd = new scala.util.Random(11)
    val dim = 16
    val points = (0L until 120L).map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val emb = points.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding")
    val model = Similarity.pqTrain(emb, "vec_id", "embedding", dim = dim, m = 4, k = 16)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", model)
      .as[(Long, Long)].collect().toMap
    val byId = points.toMap
    codes.foreach { case (id, packed) =>
      (0 until model.m).foreach { s =>
        val code = ((packed >> (4 * s)) & 15L).toInt
        assert(code >= 0 && code < model.k)
        val sub = byId(id).slice(s * model.subDim, (s + 1) * model.subDim)
        val best = model.codebooks(s).indices.minBy(c =>
          (-Similarity.cosineLocal(sub, model.codebooks(s)(c)), c))
        assert(code == best, s"id=$id subspace=$s")
      }
    }
    // 4-bit fields above m stay zero: the whole word fits m*4 bits
    assert(codes.values.forall(p => (p >>> (4 * model.m)) == 0L))
  }

  test("PQ codebooks are bitwise identical at any parallelism (fixed-point sums)") {
    val rnd = new scala.util.Random(23)
    val points = (0L until 300L).map(i => (i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    val one = points.toDF("vec_id", "embedding").repartition(1)
    val many = points.toDF("vec_id", "embedding").repartition(13)
    val m1 = Similarity.pqTrain(one, "vec_id", "embedding", dim = 16, m = 4)
    val m2 = Similarity.pqTrain(many, "vec_id", "embedding", dim = 16, m = 4)
    (0 until 4).foreach { s =>
      (0 until 16).foreach { c =>
        assert(m1.codebooks(s)(c).sameElements(m2.codebooks(s)(c)), s"s=$s c=$c")
      }
    }
  }

  test("ADC top-k over PQ codes tracks the float dot brute force on clustered data") {
    // same clustered construction as the IVF recall gates: PQ quality is
    // only measurable where neighborhoods exist
    val rnd = new scala.util.Random(31)
    val dim = 16
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val points = (0L until 400L).map { i =>
      val c = centers((i % 16).toInt)
      (i, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    }
    val emb = points.toDF("vec_id", "embedding")
    val model = Similarity.pqTrain(emb, "vec_id", "embedding", dim = dim, m = 4, k = 16)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", model)
    // codes lose within-cell ordering, so raw ADC is judged as a SHORTLIST
    // (does the coarse score net the true neighbors?) and the refined path
    // as the final ranking — exactly how production PQ is deployed
    val (shortRecalls, refinedRecalls) = Seq(0L, 42L, 137L, 233L).map { qid =>
      val q = emb.filter($"vec_id" === qid).select("embedding").head().getSeq[Float](0).toArray
      val exact = Similarity.bruteForceDotTopK(emb, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      val short = Similarity.pqTopK(codes, "vec_id", "pq_code", model, q, 50)
        .collect().map(_.getLong(0)).toSet
      val refined = Similarity.pqTopKRefined(codes, emb, "vec_id", "pq_code",
        "embedding", model, q, k = 10, shortlist = 50)
        .collect().map(_.getLong(0)).toSet
      (exact.intersect(short).size / 10.0, exact.intersect(refined).size / 10.0)
    }.unzip
    val shortMean = shortRecalls.sum / shortRecalls.size
    val refinedMean = refinedRecalls.sum / refinedRecalls.size
    assert(shortMean >= 0.8, s"ADC shortlist@50 recall of true top-10: $shortRecalls")
    assert(refinedMean >= 0.9, s"refined recall@10 per query $refinedRecalls")
  }

  test("ivfPqTopK: full probe equals plain PQ; partial probe stays inside its lists") {
    val rnd = new scala.util.Random(41)
    val dim = 16
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val points = (0L until 400L).map { i =>
      val c = centers((i % 16).toInt)
      (i, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    }
    val emb = points.toDF("vec_id", "embedding")
    val (index, ivf, pq) = Similarity.ivfPqIndex(emb, "vec_id", "embedding",
      dim = dim, nlist = 16, m = 4, k = 16)
    val q = emb.filter($"vec_id" === 42L).select("embedding").head().getSeq[Float](0).toArray
    // probing every list = no pruning: must equal plain PQ over the corpus
    val full = Similarity.ivfPqTopK(index, ivf, pq, "vec_id", q, k = 10, nprobe = 16)
      .as[(Long, Double)].collect().toSeq
    val plain = Similarity.pqTopK(
      Similarity.pqEncode(emb, "vec_id", "embedding", pq), "vec_id", "pq_code", pq, q, 10)
      .as[(Long, Double)].collect().toSeq
    assert(full == plain)
    // a partial probe only ever returns vectors from the probed lists
    val probed = ivf.nearestLists(q, 2).toSet
    val narrow = Similarity.ivfPqTopK(index, ivf, pq, "vec_id", q, k = 10, nprobe = 2)
      .select("vec_id").as[Long].collect().toSet
    val listOf = index.select("vec_id", "centroid_id").as[(Long, Int)].collect().toMap
    assert(narrow.nonEmpty && narrow.forall(id => probed.contains(listOf(id))))
  }

  test("sample-trained quantizers keep recall: PQ refined and IVF, half-corpus training") {
    // the 100 TB training regime: codebooks see only the deterministic
    // unit-hash half of the corpus, encoding/assignment covers every
    // vector — recall on clustered data must hold anyway, and the sampled
    // model must differ from nothing-trained while staying deterministic
    val rnd = new scala.util.Random(13)
    val dim = 16
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val points = (0L until 400L).map { i =>
      val c = centers((i % 16).toInt)
      (i, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    }
    val emb = points.toDF("vec_id", "embedding")
    val model = Similarity.pqTrain(emb, "vec_id", "embedding", dim = dim,
      m = 4, k = 16, trainSampleFraction = 0.5, sampleSalt = 3L)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", model)
    val refinedRecalls = Seq(0L, 42L, 137L, 233L).map { qid =>
      val q = emb.filter($"vec_id" === qid).select("embedding").head().getSeq[Float](0).toArray
      val exact = Similarity.bruteForceDotTopK(emb, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      val refined = Similarity.pqTopKRefined(codes, emb, "vec_id", "pq_code",
        "embedding", model, q, k = 10, shortlist = 50)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(refined).size / 10.0
    }
    assert(refinedRecalls.sum / refinedRecalls.size >= 0.9,
      s"sample-trained refined recall@10: $refinedRecalls")

    val (assignments, ivf) = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nlist = 16, trainSampleFraction = 0.5, sampleSalt = 3L)
    val ivfRecalls = Seq(0L, 5L, 42L, 137L).map { qid =>
      val q = emb.filter($"vec_id" === qid).select("embedding").head().getSeq[Float](0).toArray
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      val approx = Similarity.ivfTopK(assignments, ivf, "vec_id", "embedding",
        q, k = 10, nprobe = 4).collect().map(_.getLong(0)).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    assert(ivfRecalls.sum / ivfRecalls.size >= 0.9,
      s"sample-trained IVF recall@10: $ivfRecalls")

    // the sample is deterministic: training twice gives the same codebooks
    val model2 = Similarity.pqTrain(emb, "vec_id", "embedding", dim = dim,
      m = 4, k = 16, trainSampleFraction = 0.5, sampleSalt = 3L)
    assert(model.codebooks.flatten.flatten.toSeq == model2.codebooks.flatten.flatten.toSeq)
    // and a fraction that cannot seed 16 centroids raises, not silently shrinks
    intercept[IllegalArgumentException] {
      Similarity.pqTrain(emb, "vec_id", "embedding", dim = dim, m = 4, k = 16,
        trainSampleFraction = 0.01)
    }
  }

  test("pqTrain rejects codes that cannot pack and dims that cannot split") {
    val emb = (0L until 20L).map(i => (i, Seq.fill(16)(i.toFloat))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.pqTrain(emb, "vec_id", "embedding", dim = 16, m = 5) // 5 does not divide 16
    }
    intercept[IllegalArgumentException] {
      Similarity.pqTrain(emb, "vec_id", "embedding", dim = 16, m = 4, k = 17) // > 4 bits
    }
  }
}
