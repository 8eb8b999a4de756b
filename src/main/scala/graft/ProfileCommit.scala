package graft

import org.apache.spark.sql.functions._

/** Interleaved micro-benchmark of the Hadoop FileOutputCommitter algorithm
  * (v1 job-commit renames vs v2 task-commit renames) on the rig's local FS:
  * the same tiny parquet write, alternating the per-write option, many
  * reps — the same-JVM interleave cancels the rig's multi-minute noise
  * windows that defeat cross-process A/Bs.
  */
object ProfileCommit {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.get("graft-profile-commit")
    val reps = args.headOption.map(_.toInt).getOrElse(30)
    val df = s.range(0L, 10000L, 1L, 8).select(col("id"), (col("id") * 2).as("v"))
    df.count() // warm
    val root = java.nio.file.Files.createTempDirectory("commitprof").toString
    def once(algo: String, i: Int): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.algorithm.version", algo)
        .parquet(s"$root/a$algo-$i")
      (System.nanoTime() - t0) / 1e9
    }
    once("1", -1); once("2", -1) // warm both paths
    val (t1, t2) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (0 until reps).foreach { i => t1 += once("1", i); t2 += once("2", i) }
    def stats(a: Array[Double]) = {
      val s = a.sorted
      f"min=${s.head}%.3f med=${s(s.length / 2)}%.3f mean=${a.sum / a.length}%.3f"
    }
    println(s"[commit] v1 ${stats(t1.result())}")
    println(s"[commit] v2 ${stats(t2.result())}")
    s.stop()
  }
}
