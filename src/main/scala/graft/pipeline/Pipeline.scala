package graft.pipeline

import graft.sources.Sources
import graft.sources.Sources.Source
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The pipeline interpreter (SURVEY.md §2.13, X1-X3): where the reference
  * hand-loops extract -> transform -> load per batch with a shared buffer
  * (`internal_raw_to_dwh/standard_pipeline.py:59-138`), this builds ONE lazy
  * logical plan — Catalyst's pipelined execution replaces the loop, and the
  * sink action triggers it. Checkpoint ordering (K6) is preserved by
  * sequencing: sink action first, checkpoint write only on success; a missing
  * source (failOnMissing=false) skips both.
  */
final case class Pipeline(
    source: Source,
    transforms: Seq[DataFrame => DataFrame] = Nil,
    failOnMissing: Boolean = true,
    sink: Option[DataFrame => Unit] = None,
    checkpoint: Option[() => Unit] = None,
    advisorMode: Pipeline.AdvisorMode = Pipeline.AdvisorOff,
    gate: Option[DataFrame => Unit] = None,
    observedGate: Option[DataFrame => (DataFrame, () => Unit)] = None,
    stagedSink: Option[DataFrame => () => Unit] = None) {

  require(sink.isEmpty || stagedSink.isEmpty,
    "a pipeline takes sink OR stagedSink, not both")

  /** Build the logical plan without running it. None = source missing + skip.
    * With an advisor mode set, the assembled plan is inspected by
    * [[graft.plans.PlanAdvisor]] BEFORE anything executes: `AdvisorLog`
    * logs every finding; `AdvisorFail` additionally vetoes the run with
    * [[graft.GraftPlanError]] on any Critical one. Pure plan inspection —
    * no jobs run either way.
    */
  def plan(spark: SparkSession): Option[DataFrame] =
    Sources.open(spark, source, failOnMissing).map { df =>
      val planned = transforms.foldLeft(df)((d, t) => t(d))
      if (advisorMode != Pipeline.AdvisorOff) {
        val warnings = graft.plans.PlanAdvisor.advise(planned)
        warnings.foreach(w => Pipeline.log.warn(s"[plan-advisor] ${w.message}"))
        val criticals = warnings.filter(_.severity == graft.plans.PlanAdvisor.Critical)
        if (advisorMode == Pipeline.AdvisorFail && criticals.nonEmpty)
          throw new graft.GraftPlanError(
            s"plan vetoed: ${criticals.map(_.message).mkString("; ")}")
      }
      planned
    }

  /** Run end-to-end: data-quality gate (if configured), then the sink, then
    * (and only then) the checkpoint. Returns the planned DataFrame when the
    * source existed.
    *
    * The EAGER gate runs BEFORE the sink — a failed expectation
    * ([[graft.GraftDataError]] from the config's `expectations` section)
    * stops both the sink and the checkpoint, so bad data never lands AND
    * the watermark never advances past it. Unlike the plan-time advisor,
    * the gate executes (one aggregation pass over the data — at corpus
    * scale, a second full scan per run).
    *
    * The OBSERVED gate (`expectations.scan: "fused"`) removes that second
    * scan: it instruments the plan with `Dataset.observe` metrics that the
    * SINK's own action collects, and its verdict thunk runs after the sink
    * returns — so a violation throws AFTER the sink action but BEFORE the
    * checkpoint; the watermark never advances past it. With a plain sink,
    * bad data has been written by then. A STAGED sink closes even that: it
    * writes in its call and returns a publish thunk, which run() invokes
    * only after the verdict passes — so a violating run never becomes
    * visible to readers (the versioned sink stages this way: the run
    * directory lands, `latest` repoints only post-verdict).
    *
    * A checkpoint may only advance past data that was actually PROCESSED:
    * with no sink configured, the plan is still executed (count) before the
    * checkpoint fires, so a failure anywhere in the transforms keeps the
    * watermark where it was — never "checkpoint written, nothing ran".
    */
  def run(spark: SparkSession): Option[DataFrame] =
    plan(spark).map { df =>
      gate.foreach(g => g(df))
      val (toRun, verdict) = observedGate match {
        case Some(attach) => attach(df)
        case None => (df, () => ())
      }
      val publish: () => Unit = (sink, stagedSink) match {
        case (Some(s), _) => s(toRun); () => ()
        case (_, Some(s)) => s(toRun)
        case _ =>
          // an observed gate needs SOME action to collect its metrics
          if (checkpoint.isDefined || observedGate.isDefined) toRun.count(): Unit
          () => ()
      }
      verdict() // throws before anything can become visible or advance
      publish()
      checkpoint.foreach(_())
      df
    }
}

object Pipeline {
  private[pipeline] val log = org.slf4j.LoggerFactory.getLogger(classOf[Pipeline])

  /** Advisor gate for an assembled pipeline plan (config: `advisor.mode`). */
  sealed trait AdvisorMode
  /** No inspection (default — existing configs are untouched). */
  case object AdvisorOff extends AdvisorMode
  /** Log every PlanAdvisor finding, run anyway. */
  case object AdvisorLog extends AdvisorMode
  /** Log, and veto the run with [[graft.GraftPlanError]] on any Critical. */
  case object AdvisorFail extends AdvisorMode
}
