package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away into the hills tonight"

  private lazy val docs = Seq(
    (0L, base),
    (1L, base), // exact duplicate of 0
    (2L, base.replace("quick", "rapid")), // near-duplicate of 0
    (3L, "completely different content about spark query engines and columnar formats at scale"),
    (4L, "unrelated short text")
  ).toDF("doc_id", "text")

  test("connectedComponents labels every node with its component minimum") {
    // chain 1-2-3, pair 10-11, isolated edge 20-21; node 3 only reaches 1
    // transitively through 2
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (21L, 20L)).toDF("a", "b")
    val labels = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("CC dedup keeps one representative per transitive cluster; greedy can over-drop") {
    // a(0) ~ b(1) and b(1) ~ c(2) transitively cluster {0,1,2} even if a and
    // c never share a verified pair
    val v0 = Array.fill(8)(1.0f)
    val v1 = v0.updated(0, 1.01f) // nearly identical to v0
    val v2 = v1.updated(1, 1.02f) // nearly identical to v1
    val far = Array.tabulate(8)(i => if (i % 2 == 0) -1.0f else 1.0f)
    val emb = Seq(
      (0L, v0.toSeq), (1L, v1.toSeq), (2L, v2.toSeq), (3L, far.toSeq)
    ).toDF("vec_id", "embedding")
    val kept = Dedup.embeddingCosineCC(emb, "vec_id", "embedding", dim = 8, threshold = 0.97)
      .select("vec_id").as[Long].collect().toSet
    // whatever the LSH bucketing yields, the representative of the {0,1,2}
    // cluster must be 0 and the far vector must survive
    assert(kept.contains(0L) && kept.contains(3L))
    assert(!kept.contains(1L), "1 duplicates 0 directly")
    val pairs = Dedup.embeddingCandidatePairs(emb, "vec_id", "embedding", dim = 8, threshold = 0.97)
      .as[(Long, Long)].collect().toSet
    // the chain premise: 0-1 and 1-2 are verified pairs
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 2L)))
    assert(!kept.contains(2L), "2 joins the cluster transitively through 1")
  }

  test("ngramJaccardCC clusters a chain of overlapping revisions to one representative") {
    // 0 and 1 share most shingles; 1 and 2 share most shingles; 0 and 2
    // overlap less — the chain still forms ONE cluster under CC
    val t0 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val t1 = t0 + " omicron pi rho"
    val t2 = t1.replace("alpha beta gamma delta", "one two three four")
    val chain = Seq((0L, t0), (1L, t1), (2L, t2), (9L, "something else entirely about query engines"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(chain, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 2L)), s"chain premise: $pairs")
    val kept = Dedup.ngramJaccardCC(chain, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 9L), s"one representative per cluster, got $kept")
  }

  test("connectedComponents collapses a long chain in O(log n) rounds (pointer doubling)") {
    // path graph 0-1-2-...-63: diameter 63, so pure min-label propagation
    // needs ~63 rounds; with the shortcutting step the fixpoint (plus the
    // round that detects it) must land within ceil(log2 64) + 3 = 9
    val n = 64
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(edges)
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got == (0L until n.toLong).map(_ -> 0L).toMap, "one component labeled by its minimum")
    assert(rounds <= 9, s"expected <= log2($n)+3 rounds, took $rounds")
  }

  test("a flood of identical documents cannot blow up the LSH buckets (exact pre-collapse)") {
    // 1000 copies of one doc + the distinct docs: without the exact-dedup
    // pre-pass the banded self-join would generate ~10^6 pairs per band —
    // with it, the flood collapses to one representative before any banding
    val flood = (100L until 1100L).map(i => (i, base))
    val flooded = docs.unionByName(flood.toDF("doc_id", "text"))
    val keptMinhash = Dedup.minhashLsh(flooded, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptMinhash.forall(_ < 100L), "every flood clone must be dropped")
    assert(keptMinhash.contains(3L) && keptMinhash.contains(4L))
    val keptJaccardCC = Dedup.ngramJaccardCC(flooded, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptJaccardCC.forall(_ < 100L))
    assert(keptJaccardCC.contains(3L) && keptJaccardCC.contains(4L))
  }

  test("connectedComponents matches a union-find reference on a random graph") {
    val rnd = new scala.util.Random(11)
    val n = 200
    val edges = Seq.fill(260)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // union-find ground truth
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val expected = nodes.map { id =>
      // component label = min node id in the component
      val root = find(id.toInt)
      id -> nodes.filter(m => find(m.toInt) == root).min
    }.toMap
    val got = Dedup.connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("dedup ops return the caller's FULL rows, not the internal projection") {
    val withMeta = docs.withColumn("lang", lit("en")).withColumn("source", lit("s1"))
    Seq(
      Dedup.minhashLsh(withMeta, "doc_id", "text"),
      Dedup.simhash(withMeta, "doc_id", "text"),
      Dedup.ngramJaccard(withMeta, "doc_id", "text", threshold = 0.5),
      Dedup.ngramJaccardCC(withMeta, "doc_id", "text", threshold = 0.5)
    ).foreach { out =>
      assert(out.columns.toSet == Set("doc_id", "text", "lang", "source"),
        s"survivors must keep every input column, got ${out.columns.toSeq}")
      assert(out.select("lang").distinct().head().getString(0) == "en")
    }
  }

  test("exact dedup keeps the smallest id per identical content") {
    val kept = Dedup.exact(docs, "doc_id", Seq("text")).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(0L, 2L, 3L, 4L))
  }

  test("minhash LSH drops exact and near duplicates, keeps distinct docs") {
    val kept = Dedup.minhashLsh(docs, "doc_id", "text").select("doc_id").as[Long].collect().sorted.toSeq
    assert(!kept.contains(1L), "exact dup must be dropped")
    assert(kept.contains(0L) && kept.contains(3L) && kept.contains(4L))
  }

  test("simhash drops exact and token-reordered duplicates, keeps distinct docs") {
    // SimHash is order-insensitive over the token multiset: a reordered doc
    // has Hamming distance 0. (A one-word edit in a short unweighted doc
    // flips ~sqrt(n) low-margin bits, beyond the 4-band <=3 guarantee — the
    // word-level near-dup case belongs to MinHash/Jaccard, not SimHash.)
    val reordered = base.split(' ').reverse.mkString(" ")
    val withReorder = docs.unionByName(Seq((5L, reordered)).toDF("doc_id", "text"))
    val kept = Dedup.simhash(withReorder, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(!kept.contains(1L), "identical fingerprints always collide")
    assert(!kept.contains(5L), "token-reordered doc has Hamming 0")
    assert(kept.contains(0L) && kept.contains(3L) && kept.contains(4L))
  }

  test("ngram jaccard verifies candidates against the exact threshold") {
    val kept = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(!kept.contains(1L))
    assert(kept.contains(3L) && kept.contains(4L))
  }

  test("embedding cosine dedup drops a duplicated vector, keeps orthogonal ones") {
    val v1 = Array.tabulate(8)(i => if (i == 0) 1f else 0f)
    val v1b = v1.map(_ * 2f) // same direction -> cosine 1
    val v2 = Array.tabulate(8)(i => if (i == 1) 1f else 0f)
    val emb = Seq((0L, v1.toSeq), (1L, v1b.toSeq), (2L, v2.toSeq)).toDF("vec_id", "embedding")
    val kept = Dedup.embeddingCosine(emb, "vec_id", "embedding", dim = 8, threshold = 0.95)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 2L))
  }

  test("segmentDedup keeps first occurrences, drops repeats across AND within docs") {
    val segDocs = Seq(
      (0L, "a b c d e f a b c"), // 3 segments of 3; the third repeats the first
      (1L, "a b c x y z"),       // first segment already seen in doc 0
      (2L, "d e f")              // entirely made of seen segments
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(segDocs, "doc_id", "text", segTokens = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (0L, 3L, 2L, "a b c d e f"),
      (1L, 2L, 1L, "x y z"),
      (2L, 1L, 0L, "")))
  }

  test("segmentDedup rejects carry columns that collide with its outputs") {
    val segDocs = Seq((0L, "a b c", "en")).toDF("doc_id", "text", "lang")
    // produced names (any case — resolution is case-insensitive) and
    // repeats must fail fast, not clobber or analyze ambiguous
    Seq(Seq("N_SEGS"), Seq("n_kept"), Seq("dedup_text"), Seq("doc_id"),
        Seq("lang", "LANG")).foreach { bad =>
      intercept[IllegalArgumentException] {
        Dedup.segmentDedup(segDocs, "doc_id", "text", segTokens = 3, carryCols = bad)
      }
    }
    // a legitimate carry still rides through
    val out = Dedup.segmentDedup(segDocs, "doc_id", "text", segTokens = 3,
        carryCols = Seq("lang"))
      .as[(Long, String, Long, Long, String)].collect().toSeq
    assert(out == Seq((0L, "en", 1L, 1L, "a b c")))
  }

  test("segmentDedup on disjoint docs is the identity (normalized text)") {
    val segDocs = Seq(
      (0L, "one two three four five six"),
      (1L, "seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(segDocs, "doc_id", "text", segTokens = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 2L, "one two three four five six"),
      (1L, 2L, 2L, "seven eight nine ten eleven twelve")))
  }

  test("semanticDedup prunes within k-means clusters, keeps cross-cluster reps") {
    // two tight direction groups; seeding (first nlist by id) puts one seed
    // in each group, so Lloyd separates them and each clone pair collapses
    val a = Array.tabulate(8)(i => if (i < 4) 1f else 0.1f)
    val b = Array.tabulate(8)(i => if (i < 4) 0.1f else 1f)
    val aClone = a.map(_ * 1.001f) // same direction -> cosine ~1
    val bClone = b.map(_ * 0.999f)
    val emb = Seq(
      (0L, a.toSeq), (1L, b.toSeq), (2L, aClone.toSeq), (3L, bClone.toSeq)
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding",
      nlist = 2, iters = 2, threshold = 0.99)
      .select(col("vec_id"), col("centroid_id").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(0L, 1L), s"expected clones 2,3 dropped, got $out")
    assert(out(0L) != out(1L), "the two direction groups must land in different clusters")
  }

  test("semanticDedup's oversized-cluster guard keeps bucket-representative semantics") {
    // 6 near-identical vectors (distinct values, cosine ~1 pairwise) + 2
    // orthogonal ones; guardClusterSize=2 forces the representative path for
    // the big cluster. All flood members share every sign bucket, so exactly
    // the min id survives — same outcome as all-pairs — and the orthogonal
    // vectors (cosine ~0 to any representative) are untouched.
    val flood = (0L until 6L).map(i => (i, Seq(1f, i * 1e-5f, 0f, 0f)))
    val others = Seq((10L, Seq(0f, 1f, 0f, 0f)), (11L, Seq(0f, 0f, 1f, 0f)))
    val emb = (flood ++ others).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding",
      nlist = 1, iters = 1, threshold = 0.95, guardClusterSize = 2)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(0L, 10L, 11L), s"guarded cluster must keep only the min id: $out")
  }

  test("incrementalExact admits only content absent from the corpus") {
    val corpus = Seq((0L, "seen one"), (1L, "seen two")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "seen one"),   // exact dup of corpus
      (11L, "brand new"),  // genuinely new
      (12L, "brand new"),  // within-batch dup of 11
      (13L, "seen two")    // exact dup of corpus
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalExact(corpus, batch, "doc_id", Seq("text"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(11L))
  }

  test("incrementalExact with an empty corpus keeps the within-batch dedup") {
    val corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = Seq((5L, "x"), (6L, "x"), (7L, "y")).toDF("doc_id", "text")
    val kept = Dedup.incrementalExact(corpus, batch, "doc_id", Seq("text"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(5L, 7L))
  }

  test("incrementalExactTable admits exactly what the bloom-pruned exact gate admits") {
    val corpus = Seq((1L, "seen one"), (2L, "seen two")).toDF("doc_id", "text")
    val batch = Seq(
      (11L, "brand new"),
      (12L, "brand new"),  // within-batch dup of 11
      (13L, "seen two")    // exact dup of corpus
    ).toDF("doc_id", "text")
    val viaBloom = Dedup.incrementalExact(corpus, batch, "doc_id", Seq("text"))
      .select("doc_id").as[Long].collect().toSet
    val table = Dedup.KeyTable(
      Dedup.corpusContentKeys(corpus, Seq("text"), nShards = 8), nShards = 8)
    val viaTable = Dedup.incrementalExactTable(corpus, batch, "doc_id", Seq("text"), table)
      .select("doc_id").as[Long].collect().toSet
    assert(viaTable == viaBloom && viaTable == Set(11L),
      s"table $viaTable, bloom $viaBloom")
  }

  test("table probe degrades past maxBroadcastKeys to a planner join, admissions identical") {
    // an oversized batch (backfill replay, catch-up burst) must NOT force
    // a multi-GB broadcast of its key set — past the bound the probe
    // leaves the join shape to the planner. The hit-id set must be
    // identical either way: the bound changes the JOIN STRATEGY, never
    // the admissions.
    val corpus = spark.range(0L, 200L)
      .select($"id".as("doc_id"), concat(lit("doc "), $"id").as("text"))
    val table = Dedup.KeyTable(
      Dedup.corpusContentKeys(corpus, Seq("text"), nShards = 8), nShards = 8)
    val batchKeys = spark.range(100L, 400L)
      .select($"id".as("doc_id"), concat(lit("doc "), $"id").as("text"))
      .select($"doc_id", Dedup.contentBloomKey(Seq("text")).as("__k"))
    def hits(maxKeys: Long): (Set[Long], Boolean) = {
      val df = Dedup.tableCandidateIds(batchKeys, "doc_id", table,
        maxBroadcastKeys = maxKeys)
      val saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
      val forced = try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        // a FORCED broadcast survives even with auto-broadcast off — that
        // is exactly what must NOT happen past the bound
        val savedB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          Dedup.tableCandidateIds(batchKeys, "doc_id", table, maxBroadcastKeys = maxKeys)
            .queryExecution.executedPlan.collect {
              case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
            }.nonEmpty
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedB)
      } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
      (df.select("doc_id").as[Long].collect().toSet, forced)
    }
    val (small, forcedSmall) = hits(maxKeys = 4L << 20)
    val (big, forcedBig) = hits(maxKeys = 10L) // 300 keys >> 10
    assert(forcedSmall, "micro-batch regime must force the broadcast probe")
    assert(!forcedBig,
      "past maxBroadcastKeys the probe must leave the join to the planner")
    assert(small == big && small == (100L until 200L).toSet,
      s"admissions must not depend on the join strategy: ${small.size} vs ${big.size}")
  }

  test("incrementalMinhash rejects near-dups of the corpus that the exact gate admits") {
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val base = words("a", 40)
    // one token changed at the tail: 3 of 41 distinct trigrams differ,
    // exact-Jaccard 35/41 ≈ 0.854 ≥ 0.8 — a near-dup, not an exact clone
    val reCrawl = words("a", 39) + " zz"
    val fresh = words("b", 40)
    val corpus = Seq((1L, base)).toDF("doc_id", "text")
    val batch = Seq((10L, base), (11L, reCrawl), (12L, fresh), (13L, fresh))
      .toDF("doc_id", "text")
    val admitted = Dedup.incrementalMinhash(corpus, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(12L),
      s"exact clone 10, near-dup 11 and within-batch dup 13 must all be rejected: $admitted")
    // the exact gate's re-crawl hole, demonstrated: one changed token sails through
    val exactAdmitted = Dedup.incrementalExact(corpus, batch, "doc_id", Seq("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(exactAdmitted.contains(11L), "premise: the exact gate admits the re-crawl")
  }

  test("incrementalMinhash table probe admits exactly what the bloom probe admits") {
    // the past-driver-memory sidecar form: the probe is a shard-pruned
    // equi-join against an exact band-key table instead of a lit() bloom.
    // Admissions must be identical — the probe only chooses WHICH rows pay
    // the confirm join, and the table's exact key set is a superset-free
    // version of what the bloom flags
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val corpus = Seq((1L, words("a", 40)), (2L, words("c", 40))).toDF("doc_id", "text")
    val batch = Seq(
      (10L, words("a", 40)),            // exact clone of corpus
      (11L, words("a", 39) + " zz"),    // near-dup of corpus
      (12L, words("b", 40)),            // fresh
      (13L, words("b", 40)),            // within-batch dup of 12
      (14L, words("c", 38) + " q1 q2")  // near-dup of corpus doc 2
    ).toDF("doc_id", "text")
    val viaBloom = Dedup.incrementalMinhash(corpus, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val table = Dedup.KeyTable(
      Dedup.corpusBandKeys(corpus, "text", n = 3, numHashes = 64, bands = 16,
        seed = 42L, nShards = 8), nShards = 8)
    val viaTable = Dedup.incrementalMinhash(corpus, batch, "doc_id", "text",
      bandKeyTable = Some(table))
      .select("doc_id").as[Long].collect().toSet
    assert(viaTable == viaBloom, s"table $viaTable != bloom $viaBloom")
    assert(viaTable == Set(12L))

    // and on the real documents fixture: a mod-5 corpus/batch split must
    // gate identically through both probe forms
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val corpusDocs = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val batchDocs = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val fixtureBloom = Dedup.incrementalMinhash(corpusDocs, batchDocs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val fixtureTable = Dedup.incrementalMinhash(corpusDocs, batchDocs, "doc_id", "text",
      bandKeyTable = Some(Dedup.KeyTable(
        Dedup.corpusBandKeys(corpusDocs, "text", n = 3, numHashes = 64,
          bands = 16, seed = 42L, nShards = 16), nShards = 16)))
      .select("doc_id").as[Long].collect().toSet
    assert(fixtureTable == fixtureBloom)
    assert(fixtureTable.nonEmpty, "fixture batch must admit something")
  }

  test("incrementalMinhash with an empty corpus keeps the within-batch near-dup dedup") {
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = Seq((1L, words("a", 40)), (2L, words("a", 39) + " zz"), (3L, words("b", 40)))
      .toDF("doc_id", "text")
    val admitted = Dedup.incrementalMinhash(empty, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 3L), s"batch-internal near-dup family keeps its min id: $admitted")
  }

  test("semanticContamination surfaces re-embedded eval items and keeps zero-hit rows") {
    val rnd = new scala.util.Random(59)
    val dim = 64
    val corpus = (0L until 200L)
      .map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
    val corpusDf = corpus.toDF("vec_id", "embedding")
    // eval: two corpus vectors with a tiny deterministic perturbation (the
    // paraphrase stand-in) + one unrelated vector that must report 0 hits
    val evalDf = Seq(
      (1000L, corpus(17)._2.map(x => x * 1.001f)),
      (1001L, corpus(42)._2.map(x => x * 0.999f)),
      (1002L, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val out = operators.Dedup.semanticContamination(
      corpusDf, evalDf, "vec_id", "embedding", dim = dim,
      threshold = 0.99, bandBits = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2))))).toMap
    assert(out.keySet == Set(1000L, 1001L, 1002L), "every eval item reports")
    assert(out(1000L)._1 >= 1L && out(1001L)._1 >= 1L,
      s"scaled copies must surface their sources: $out")
    assert(out(1002L) == ((0L, None)), "unrelated eval item: zero hits, null max_cos")
    // a uniform positive scaling leaves cosine at ~1 — the max_cos of a
    // found source reflects that
    assert(out(1000L)._2.exists(_.asInstanceOf[Double] > 0.999))
  }

  test("containmentScores finds A-inside-B that Jaccard dilutes away") {
    val frame = Seq(
      // A: 6 tokens -> 2 distinct 5-shingles, both inside B
      (1L, "a1 a2 a3 a4 a5 a6"),
      // B: wraps A with extra context -> 4 shingles, 2 shared with A
      (2L, "x0 a1 a2 a3 a4 a5 a6 x1"),
      // C: unrelated -> zero common shingles
      (3L, "c1 c2 c3 c4 c5 c6 c7"),
      // D: too short for a 5-shingle -> empty shingle set
      (4L, "d1 d2 d3")
    ).toDF("doc_id", "text")
    val out = Dedup.containmentScores(frame, "doc_id", "text", n = 5, threshold = 0.9)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 1.0, 1L)), "A fully contained in B")
    assert(out(2L) == ((4L, 0.5, 0L)), "B shares half its shingles, below threshold")
    assert(out(3L) == ((7L - 4L, 0.0, 0L)), "no overlap -> zero containment")
    assert(out(4L) == ((0L, 0.0, 0L)), "sub-shingle docs score zero, not null")
    // the same pair under symmetric Jaccard: 2 / (2 + 4 - 2) = 0.5 — the
    // dilution containment exists to avoid
  }

  test("containmentScores excludes boilerplate shingles above the df cut") {
    // one shingle shared by 3 docs; with maxShingleDf = 2 it is boilerplate
    // and must not count toward containment for anyone
    val boiler = "b1 b2 b3 b4 b5"
    val frame = Seq(
      (1L, s"$boiler u1 u2 u3 u4 u5"),
      (2L, s"$boiler v1 v2 v3 v4 v5"),
      (3L, boiler)
    ).toDF("doc_id", "text")
    val out = Dedup.containmentScores(
      frame, "doc_id", "text", n = 5, threshold = 0.9, maxShingleDf = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // doc 3's only shingle is the boilerplate one -> empty rare space
    assert(out(3L) == ((0L, 0.0)))
    // docs 1/2 keep only their unique tails, which do not overlap
    assert(out(1L)._2 == 0.0 && out(2L)._2 == 0.0)
    assert(out(1L)._1 > 0L, "unique shingles survive the cut")
  }

  test("duplicateSpanStats measures interval-union coverage of repeated windows") {
    // k=3 windows. doc 1 and doc 2 share the run "a b c d" (two overlapping
    // duplicated windows: [a b c], [b c d] -> union covers 4 tokens); doc 3
    // repeats "x y z" INSIDE itself (self-repeat also counts); doc 4 is
    // unique; doc 5 is shorter than k (zero windows)
    val frame = Seq(
      (1L, "a b c d p q r"),
      (2L, "m n a b c d"),
      (3L, "x y z g h x y z"),
      (4L, "u1 u2 u3 u4 u5"),
      (5L, "t1 t2")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpanStats(frame, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(1L) == ((7L, 5L, 2L, 4L, 4.0 / 7.0)), "cross-doc run, overlap unioned")
    assert(out(2L) == ((6L, 4L, 2L, 4L, 4.0 / 6.0)))
    assert(out(3L) == ((8L, 6L, 2L, 6L, 6.0 / 8.0)), "self-repeat counts, disjoint spans sum")
    assert(out(4L) == ((5L, 3L, 0L, 0L, 0.0)), "unique doc untouched")
    assert(out(5L) == ((2L, 0L, 0L, 0L, 0.0)), "sub-k doc yields zero windows, not [1,0]")
  }

  test("removeDuplicateSpans excises later occurrences, keeps the global first") {
    // same fixture as the stats test (k=3): doc 1 and doc 2 share "a b c d",
    // doc 3 self-repeats "x y z". Keep-first by (doc_id, pos) means doc 1
    // keeps its copy and doc 2 loses the shared run; doc 3 keeps the first
    // "x y z" and loses the trailing one.
    val frame = Seq(
      (1L, "a b c d p q r"),
      (2L, "m n a b c d"),
      (3L, "x y z g h x y z"),
      (4L, "u1 u2 u3 u4 u5"),
      (5L, "t1 t2")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(frame, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((7L, 0L, "a b c d p q r")), "global first occurrence survives intact")
    assert(out(2L) == ((6L, 4L, "m n")), "later cross-doc occurrence excised (interval union)")
    assert(out(3L) == ((8L, 3L, "x y z g h")), "self-repeat: first kept, trailing copy excised")
    assert(out(4L) == ((5L, 0L, "u1 u2 u3 u4 u5")), "unique doc untouched")
    assert(out(5L) == ((2L, 0L, "t1 t2")), "sub-k doc has no windows to excise")
  }

  test("removeDuplicateSpans carries extra columns through the rebuild") {
    // carryCols ride the toks side so composed pipelines don't re-join (and
    // re-execute) their gated upstream; excision results must be unchanged
    val frame = Seq(
      (1L, "a b c d p q r", "en"),
      (2L, "m n a b c d", "de"),
      (5L, "t1 t2", "fr")
    ).toDF("doc_id", "text", "lang")
    val out = Dedup.removeDuplicateSpans(frame, "doc_id", "text", k = 3,
      carryCols = Seq("lang"))
    assert(out.columns.toSeq ==
      Seq("doc_id", "lang", "n_tokens", "removed_tokens", "clean_text"))
    val m = out.collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getLong(3), r.getString(4)))).toMap
    assert(m(1L) == (("en", 0L, "a b c d p q r")))
    assert(m(2L) == (("de", 4L, "m n")), "excision identical with carried cols")
    assert(m(5L) == (("fr", 0L, "t1 t2")))
  }

  test("minhash signatures are deterministic across evaluations") {
    val sig = Dedup.minhashSignature(graft.operators.TextAnalysis.wordShingles(col("text"), 3), 16)
    val a = docs.select(sig).collect().map(_.getSeq[Long](0))
    val b = docs.select(sig).collect().map(_.getSeq[Long](0))
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.head.length == 16)
  }
}
