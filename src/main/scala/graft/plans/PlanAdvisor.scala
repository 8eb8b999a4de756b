package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BinaryComparison, Contains, EndsWith, Expression, In, InSet, IsNotNull, IsNull, Literal, Not, Or, ScalaUDF, StartsWith}
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{CoalesceExec, FileSourceScanExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{REPARTITION_BY_NUM, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Typed performance warnings over a query's PHYSICAL plan — the engine's
  * analog of the reference's structured warning taxonomy (app/warnings/
  * base_warning.py:1-5, performance_warnings.py, data_warnings.py), re-aimed
  * at what actually hurts on a cluster: plan shapes that are correct at test
  * scale and catastrophic at 100 TB. The reference warns about runtime
  * conditions (process counts, JSON sizes) because its engine is imperative;
  * in a declarative engine the equivalent early-warning surface is the plan,
  * BEFORE execution spends cluster-hours proving the problem.
  *
  * Each detector names one scale-killer and why it is one. [[advise]] is
  * pure inspection — no jobs run, so it is safe to call on every pipeline
  * build (Pipeline wires it behind a config gate). PlanGuardSpec drives the
  * same detectors across the whole 108-query surface with an exact
  * allowlist, so the detectors themselves are regression-tested; this
  * object is the reusable library face of that net.
  */
object PlanAdvisor {

  sealed trait Severity
  /** Would dominate or break a 100 TB run; an allowlist-worthy exception
    * needs a stated bound. */
  case object Critical extends Severity
  /** Legitimate in some plans; worth a look when unexpected. */
  case object Advisory extends Severity

  sealed trait PlanWarning {
    def severity: Severity
    def message: String
  }

  /** A join with no equi-keys: |left|×|right| pair volume. Only bounded
    * (broadcast scalar / ≤k-row) sides survive this at scale. */
  final case class CartesianJoin(node: String) extends PlanWarning {
    val severity: Severity = Critical
    def message = s"cartesian/nested-loop join ($node): pair volume is |L|x|R|; " +
      "only a provably bounded side (scalar frame, <=k-row broadcast) survives at scale"
  }

  /** A Scala UDF in the plan: breaks whole-stage codegen around it and
    * serializes every row through the closure. */
  final case class UdfFallback(count: Int) extends PlanWarning {
    val severity: Severity = Critical
    def message = s"$count ScalaUDF node(s) in the plan: breaks whole-stage codegen; " +
      "prefer built-in functions or a native Expression with doGenCode"
  }

  /** A Window with an empty partition spec moves the ENTIRE input to one
    * partition — one task, one executor, no matter the cluster size. */
  final case class GlobalWindow(windowExprs: String) extends PlanWarning {
    val severity: Severity = Critical
    def message = s"Window with empty partitionBy ($windowExprs): moves all rows to " +
      "ONE partition; bound the input first (e.g. top-k via orderBy+limit) or partition the window"
  }

  /** A scan filter that cannot translate to a source (parquet) predicate —
    * e.g. over a computed expression — so row groups cannot be skipped for
    * it and every row is decoded then filtered. Detected with the same
    * translation Spark's own pushdown uses, not by string-parsing the plan.
    */
  final case class UnpushedScanFilters(scan: String, filters: String) extends PlanWarning {
    val severity: Severity = Advisory
    def message = s"scan $scan evaluates [$filters] AFTER decoding — not convertible " +
      "to a source predicate, so no row-group skipping; rewrite over raw columns " +
      "(or persist the computed column) if this gates most of the data"
  }

  /** repartition(1) / coalesce(1): a deliberate single-partition funnel —
    * every downstream byte through one task. */
  final case class SinglePartitionFunnel(node: String) extends PlanWarning {
    val severity: Severity = Critical
    def message = s"$node funnels the dataflow into ONE partition: every row through " +
      "a single task; if the intent is one output file, compact after the parallel write instead"
  }

  /** A global (total-order) sort not collapsed into a top-k: distributed and
    * correct (range-partitioned), but materializing a total order of the
    * full dataset is usually only worth it on the final write. */
  final case class GlobalSort(order: String) extends PlanWarning {
    val severity: Severity = Advisory
    def message = s"global sort ($order): range-partitioned and distributed, but a " +
      "full total order; under a limit Spark plans TakeOrderedAndProject instead — " +
      "check the order is consumed (e.g. sorted write), not incidental"
  }

  /** Conservative mirror of the convertibility rules Spark's own
    * `DataSourceStrategy.translateFilter` applies (it is `protected[sql]`):
    * a predicate reaches the source only when every leaf compares a BARE
    * column to a foldable value. Anything wrapping the column in a
    * computation (hash, cast chains, arithmetic) cannot skip row groups.
    * Conservative = may flag a pushable exotic leaf, never the reverse;
    * acceptable for an Advisory.
    *
    * An executed uncorrelated scalar subquery counts as a value: Spark
    * evaluates it once before the scan runs and substitutes the result
    * into the pushed predicate (the plan shows e.g.
    * `PushedFilters: [GreaterThan(c_acctbal, ScalarSubquery#n)]`), so a
    * threshold-from-a-subquery filter DOES skip row groups at runtime.
    */
  private def isRuntimeScalar(e: Expression): Boolean =
    e.isInstanceOf[org.apache.spark.sql.execution.ScalarSubquery]

  private def sourceTranslatable(e: Expression): Boolean = e match {
    case And(l, r) => sourceTranslatable(l) && sourceTranslatable(r)
    case Or(l, r) => sourceTranslatable(l) && sourceTranslatable(r)
    case Not(c) => sourceTranslatable(c)
    case b: BinaryComparison =>
      (b.left.isInstanceOf[AttributeReference] &&
        (b.right.foldable || isRuntimeScalar(b.right))) ||
        (b.right.isInstanceOf[AttributeReference] &&
          (b.left.foldable || isRuntimeScalar(b.left)))
    case In(_: AttributeReference, list) => list.forall(_.foldable)
    case InSet(_: AttributeReference, _) => true
    // null guards over ANY expression are exempt, not just over bare
    // columns: Catalyst inserts IsNotNull(f(col)) ahead of joins/windows
    // keyed on computed columns. Such a guard is not a selective data gate
    // — the row is decoded for f() regardless — so reporting it as "lost
    // row-group skipping" would be pure noise.
    case IsNull(_) => true
    case IsNotNull(_) => true
    case StartsWith(_: AttributeReference, Literal(_, _)) => true
    case EndsWith(_: AttributeReference, Literal(_, _)) => true
    case Contains(_: AttributeReference, Literal(_, _)) => true
    case _ => false
  }

  /** The fully-prepared pre-execution plan: exchanges inserted, AQE wrapper
    * unwrapped (its pre-execution plan — deterministic at planning time).
    */
  def preparedPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  /** Inspect `df`'s physical plan (subqueries included) and return every
    * warning, Critical first. Pure plan inspection: runs no jobs.
    */
  def advise(df: DataFrame): Seq[PlanWarning] = {
    val plan = preparedPlan(df)
    val warnings = Seq.newBuilder[PlanWarning]

    plan.collectWithSubqueries {
      case j: CartesianProductExec => warnings += CartesianJoin(j.nodeName)
      case j: BroadcastNestedLoopJoinExec => warnings += CartesianJoin(j.nodeName)
      case w: WindowExec if w.partitionSpec.isEmpty =>
        warnings += GlobalWindow(w.windowExpression.map(_.sql).mkString(", "))
      case c: CoalesceExec if c.numPartitions == 1 =>
        warnings += SinglePartitionFunnel("coalesce(1)")
      case s: ShuffleExchangeExec
          if s.outputPartitioning == SinglePartition &&
            s.shuffleOrigin == REPARTITION_BY_NUM =>
        warnings += SinglePartitionFunnel("repartition(1)")
      case s: SortExec if s.global => warnings += GlobalSort(
        s.sortOrder.map(_.sql).mkString(", "))
      case f: FileSourceScanExec if f.dataFilters.nonEmpty =>
        val untranslatable =
          f.dataFilters.filter(p => p.deterministic && !sourceTranslatable(p))
        if (untranslatable.nonEmpty)
          warnings += UnpushedScanFilters(
            f.tableIdentifier.map(_.toString).getOrElse(f.nodeName),
            untranslatable.map(_.sql).mkString(", "))
    }

    val udfs = plan.collectWithSubqueries {
      case p if p.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF])) =>
        p.expressions.map(_.collect { case u: ScalaUDF => u }.size).sum
    }.sum
    if (udfs > 0) warnings += UdfFallback(udfs)

    warnings.result().sortBy(w => w.severity match {
      case Critical => 0
      case Advisory => 1
    })
  }

  /** [[advise]] filtered to Critical — the gate form: empty means the plan
    * has no known scale-killer.
    */
  def criticals(df: DataFrame): Seq[PlanWarning] =
    advise(df).filter(_.severity == Critical)
}
