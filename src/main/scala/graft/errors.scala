package graft

/** Typed error taxonomy — the engine's analog of the reference's structured
  * error hierarchy (the `app/errors/` modules: config errors raised while
  * assembling a run vs data errors raised while executing it).
  *
  * [[GraftConfigError]] extends IllegalArgumentException and
  * [[GraftDataError]] extends IllegalStateException so call sites that catch
  * the broad JDK types keep working; callers that care about the taxonomy can
  * match on the specific types.
  */
class GraftConfigError(message: String, cause: Throwable = null)
    extends IllegalArgumentException(message, cause)

/** A data-contract violation discovered while a plan executes (e.g. a null in
  * a required field) — distinct from misconfiguration, which should fail at
  * plan-build time as [[GraftConfigError]].
  */
class GraftDataError(message: String, cause: Throwable = null)
    extends IllegalStateException(message, cause)

/** A plan vetoed BEFORE execution because [[graft.plans.PlanAdvisor]] found
  * a Critical scale-killer (cartesian join, global window, repartition(1),
  * UDF fallback) and the pipeline runs with `advisor.mode = "fail"`. The
  * declarative analog of the reference's performance warnings
  * (`app/warnings/performance_warnings.py`): raised at plan time, when
  * fixing it is free, not after cluster-hours prove it.
  */
class GraftPlanError(message: String)
    extends IllegalStateException(message)
