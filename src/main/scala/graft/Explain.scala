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
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
  }
}
