package graft

/** Whole-surface plan guard: planning-time regression net over EVERY
  * SparkEntry query. The per-operator specs assert their own plans in
  * detail; this sweep freezes the two properties that silently rot at
  * 100 TB — an accidental cartesian (a join that lost its equi-keys) and a
  * UDF fallback (an expression that fell out of codegen) — across the whole
  * surface at once, with an explicit, reasoned allowlist.
  */
class PlanGuardSpec extends SparkTestBase {

  // plans that legitimately cross a BOUNDED side (a scalar or a <=k-row
  // invariant/query frame, broadcast) — the documented tiny-side patterns.
  // The list is exact in both directions: a query outside it must not plan
  // a cartesian, and an entry whose plan no longer crosses is stale.
  private val crossAllowed: Map[String, String] = Map(
    "ann_topk_join" -> "<=5-row query side broadcast against the corpus",
    "sql_surface_topk" -> "1-row WITH q subquery crossed in SQL",
    "tfidf_top_terms" -> "1-row corpus-count scalar broadcast",
    "vocab_coverage" -> "1-row vocab-size scalar broadcast",
    "bloom_prune_check" -> "1-row invariant frames unioned with the counts",
    "token_fingerprint" -> "1-row invariant frames unioned with the counts",
    "minhash_dedup_docs" -> "dedupInvariants 1-row check frames",
    "simhash_dedup_docs" -> "dedupInvariants 1-row check frames",
    "ngram_jaccard_dedup_docs" -> "dedupInvariants 1-row check frames"
  )

  // plans that carry a Scala UDF on purpose, with the reason it is exempt
  // from the functions-not-UDFs rule
  private val udfAllowed: Map[String, String] = Map(
    "resize_meta" -> ("resize kernel is a whole-payload codec call, not row " +
      "arithmetic — nothing for codegen to fuse; payload stays binary")
  )

  // plans that legitimately run a Window with an EMPTY partition spec — the
  // pattern that moves its whole input to one partition and is the classic
  // 100 TB scale-killer. Only bounded inputs may appear here, with the bound
  // stated. Exact in both directions, like the cartesian list.
  private val globalWindowAllowed: Map[String, String] = Map(
    "vocab_coverage" -> ("rank/cumsum window runs AFTER a limit(50) " +
      "(TakeOrderedAndProject), so its input is <=50 rows by construction")
  )

  test("no query plans an unbounded cartesian or nested-loop join") {
    val crossing = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"))
        Some(name)
      else None
    }.toSet
    val offenders = crossing -- crossAllowed.keySet
    assert(offenders.isEmpty, s"unexpected cartesian/nested-loop in: $offenders")
    val stale = crossAllowed.keySet -- crossing
    assert(stale.isEmpty, s"allowlisted but no longer crossing (remove): $stale")
  }

  test("no query falls back to a Scala UDF outside the allowlist") {
    // walk the physical expression trees for ScalaUDF nodes rather than
    // string-matching "UDF(" — a named UDF prints under its registered name
    // and would escape a substring check
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    val carrying = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.sparkPlan
      val hasUdf = plan.exists(_.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF])))
      if (hasUdf) Some(name) else None
    }.toSet
    val offenders = carrying -- udfAllowed.keySet
    assert(offenders.isEmpty, s"unexpected UDF fallback in: $offenders")
    val stale = udfAllowed.keySet -- carrying
    assert(stale.isEmpty, s"allowlisted but no longer carrying a UDF (remove): $stale")
  }

  test("no query plans a Window over a single global partition") {
    import org.apache.spark.sql.execution.window.WindowExec
    val global = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.sparkPlan
      val hasGlobalWindow =
        plan.exists { case w: WindowExec => w.partitionSpec.isEmpty; case _ => false }
      if (hasGlobalWindow) Some(name) else None
    }.toSet
    val offenders = global -- globalWindowAllowed.keySet
    assert(offenders.isEmpty, s"single-partition Window in: $offenders")
    val stale = globalWindowAllowed.keySet -- global
    assert(stale.isEmpty, s"allowlisted but no longer global-windowing (remove): $stale")
  }

  test("the allowlists only name real queries") {
    val known = SparkEntry.queries.keySet
    val stale = (crossAllowed.keySet ++ udfAllowed.keySet ++
      globalWindowAllowed.keySet) -- known
    assert(stale.isEmpty, s"allowlist entries without queries: $stale")
  }
}
