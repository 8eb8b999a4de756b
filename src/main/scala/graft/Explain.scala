package graft

/** Plan-inspection main: prints `explain("formatted")` for the named
  * queries (all of them when no names are given) against
  * `SPARK_GRAFT_SF_DIR`. The iteration loop for scan/shuffle/broadcast
  * review — the formatted mode shows PushedFilters, ReadSchema and the
  * exchange tree the plan pins in PlanGuardSpec assert programmatically.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.get("graft-explain")
    val qs = SparkEntry.queries
    val names = if (args.nonEmpty) args.toSeq else qs.keys.toSeq.sorted
    val unknown = names.filterNot(qs.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")} — " +
        s"known: ${qs.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    names.foreach { n =>
      println(s"===== $n =====")
      qs(n)(spark, sfDir).explain("formatted")
    }
  }
}
