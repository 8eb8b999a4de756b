package graft

/** Ad-hoc diagnostics: `runMain graft.Probe [sfDir] [query...]` prints the
  * formatted physical plan of the named SparkEntry queries (default: a
  * pushdown/broadcast audit set). Used to keep plans honest — PushedFilters
  * reaching the scan, pruned ReadSchema, broadcast joins on dims, wide
  * WholeStageCodegen spans.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("flagship_events", "q3_topk_join", "q1_agg", "ann_topk", "minhash_dedup_docs")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
