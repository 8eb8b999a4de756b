package graft

import graft.operators.{Bpe, Dedup, EntityResolution, Graph, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** The pluggable checkpoint policy ([[Checkpointing]]): every iterative
  * operator that truncates lineage must produce BIT-IDENTICAL results under
  * `local` (executor-disk localCheckpoint — the single-JVM default) and
  * `reliable` (DFS `Dataset.checkpoint` via `spark.graft.checkpoint.dir` —
  * the mode that survives executor loss on a preemptible cluster). The
  * operators' fixed-point determinism constructions make this a pure
  * storage-policy swap; any drift between modes is a bug.
  */
class CheckpointingSpec extends SparkTestBase {
  import spark.implicits._

  private def withMode[T](mode: String)(body: => T): T = {
    spark.conf.set(Checkpointing.ModeKey, mode)
    try body finally spark.conf.unset(Checkpointing.ModeKey)
  }

  test("unknown checkpoint mode is a typed config error") {
    withMode("turbo") {
      val e = intercept[GraftConfigError](
        Checkpointing.materialize(Seq(1, 2).toDF("x")))
      assert(e.getMessage.contains(Checkpointing.ModeKey))
    }
  }

  test("reliable mode without a directory is a typed config error") {
    // only meaningful while the shared context has no checkpoint dir yet —
    // the helper defers to an operator-set directory by contract
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    withMode(Checkpointing.Reliable) {
      val e = intercept[GraftConfigError](
        Checkpointing.materialize(Seq(1).toDF("x")))
      assert(e.getMessage.contains(Checkpointing.DirKey))
    }
  }

  // 64-node chain (worst diameter for pointer doubling) + a triangle, so CC
  // exercises multi-round convergence and triangles count a real closure
  private lazy val edges = ((0L until 63L).map(i => (i, i + 1)) ++
    Seq((100L, 101L), (101L, 102L), (100L, 102L))).toDF("a", "b")
  private lazy val nodes = ((0L to 63L) ++ (100L to 102L)).toDF("id")

  private def runIterativeSurface(): Seq[Seq[String]] = {
    val (cc, rounds) = Dedup.connectedComponentsWithRounds(edges)
    assert(rounds <= 8, s"pointer doubling should stay O(log d), ran $rounds")
    val pr = Graph.pageRank(edges, nodes, iters = 3)
    val tri = Graph.triangleCounts(edges, nodes)
    val docs = Seq(
      (1L, "the cat sat on the mat", "a"), (2L, "the cat sat on a hat", "a"),
      (3L, "dogs chase the red ball", "b"), (4L, "the red ball bounced away", "b"),
      (5L, "cats and dogs live here", "a"), (6L, "the mat sat under the cat", "b")
    ).toDF("id", "text", "grp")
    val bpe = Bpe.learnMerges(docs, "text", steps = 4)
    val dsir = Sampling.importanceResample(
      docs, "id", "text", col("grp") === "a", k = 3, buckets = 64)
    val er = EntityResolution.resolve(
      docs.withColumn("name", concat(lit("doc "), col("id"))),
      "id", col("grp"), col("name"), maxDistance = 2)
    val train = TextAnalysis.trainPerceptron(
      docs, "id", "text", col("grp") === "a", buckets = 128, iters = 3)
    Seq(cc.orderBy("id"), pr.orderBy("id"), tri.orderBy("id"),
      bpe.orderBy("step"), dsir.orderBy("id"), er.orderBy("id"),
      train.orderBy("bucket"))
      .map(_.collect().toSeq.map(_.toString))
  }

  test("iterative operators are bit-identical under local and reliable modes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(Checkpointing.DirKey, dir)
    try {
      val local = withMode(Checkpointing.Local)(runIterativeSurface())
      val reliable = withMode(Checkpointing.Reliable)(runIterativeSurface())
      assert(local == reliable)
      // reliable mode must actually have written through the reliable store
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "reliable mode produced no checkpoint files")
    } finally spark.conf.unset(Checkpointing.DirKey)
  }
}
