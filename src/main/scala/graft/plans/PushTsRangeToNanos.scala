package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule (registered through [[GraftExtensions]]): rewrite range
  * comparisons on a µs timestamp DERIVED from a raw nanosecond long
  * (`timestamp_micros(ns DIV 1000)`, the events-source adapter in
  * [[graft.sources.Sources.events]]) into the exactly-equivalent bound on
  * the raw column itself.
  *
  * Why it matters: after predicate pushdown inlines the derivation, the
  * filter sits on `timestamp_micros(ns DIV 1000) >= L` — an expression over
  * the scan column, which the parquet reader cannot use. The rewritten
  * `ns >= L'` is a plain attribute comparison, so it lands in
  * `PushedFilters` and prunes row groups by min/max stats — at 100 TB the
  * difference between reading the time window and reading everything.
  *
  * Exactness: `DIV` truncates toward zero, so for a µs bound `U` the
  * smallest nanosecond with `ns DIV 1000 >= U` is `U*1000` when `U > 0`
  * but `U*1000 - 999` when `U <= 0` (pre-epoch). Using that boundary, each
  * rewrite is an equivalence — never a relaxation — and null semantics are
  * preserved (both forms are null iff `ns` is null). The rewritten form no
  * longer matches the pattern, so the optimizer's fixed point terminates.
  *
  * The manual [[graft.sources.Sources.pushTsRangeNs]] remains as the
  * explicit-API form; with this rule active, a plain
  * `df.filter(col("ts") >= ... && col("ts") < ...)` gets the same scan.
  */
object PushTsRangeToNanos extends Rule[LogicalPlan] {

  /** `timestamp_micros(ns DIV 1000)` over a directly-scannable column. */
  private object DerivedTs {
    def unapply(e: Expression): Option[Attribute] = e match {
      case MicrosToTimestamp(IntegralDivide(ns: AttributeReference, Literal(1000L, LongType), _)) =>
        Some(ns)
      case _ => None
    }
  }

  /** Smallest ns with `ns DIV 1000 >= u`; None on overflow. */
  private def lowNs(u: Long): Option[Long] =
    if (u >= Long.MaxValue / 1000L - 1L || u <= Long.MinValue / 1000L + 1L) None
    else Some(if (u > 0L) u * 1000L else u * 1000L - 999L)

  private def nsLit(v: Long): Literal = Literal(v, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // ts >= U  ⟺  ns >= lowNs(U)
    case e @ GreaterThanOrEqual(DerivedTs(ns), Literal(u: Long, TimestampType)) =>
      lowNs(u).map(b => GreaterThanOrEqual(ns, nsLit(b)): Expression).getOrElse(e)
    // ts > U  ⟺  ts >= U+1µs  ⟺  ns >= lowNs(U+1)
    case e @ GreaterThan(DerivedTs(ns), Literal(u: Long, TimestampType)) =>
      lowNs(u + 1L).map(b => GreaterThanOrEqual(ns, nsLit(b)): Expression).getOrElse(e)
    // ts < U  ⟺  ns < lowNs(U)
    case e @ LessThan(DerivedTs(ns), Literal(u: Long, TimestampType)) =>
      lowNs(u).map(b => LessThan(ns, nsLit(b)): Expression).getOrElse(e)
    // ts <= U  ⟺  ns < lowNs(U+1)
    case e @ LessThanOrEqual(DerivedTs(ns), Literal(u: Long, TimestampType)) =>
      lowNs(u + 1L).map(b => LessThan(ns, nsLit(b)): Expression).getOrElse(e)
    // literal-on-the-left mirror images
    case e @ LessThanOrEqual(Literal(u: Long, TimestampType), DerivedTs(ns)) =>
      lowNs(u).map(b => GreaterThanOrEqual(ns, nsLit(b)): Expression).getOrElse(e)
    case e @ LessThan(Literal(u: Long, TimestampType), DerivedTs(ns)) =>
      lowNs(u + 1L).map(b => GreaterThanOrEqual(ns, nsLit(b)): Expression).getOrElse(e)
    case e @ GreaterThan(Literal(u: Long, TimestampType), DerivedTs(ns)) =>
      lowNs(u).map(b => LessThan(ns, nsLit(b)): Expression).getOrElse(e)
    case e @ GreaterThanOrEqual(Literal(u: Long, TimestampType), DerivedTs(ns)) =>
      lowNs(u + 1L).map(b => LessThan(ns, nsLit(b)): Expression).getOrElse(e)
  }
}

/** Optimizer rule: unwrap range comparisons over columns DERIVED from a
  * naive-µs (TIMESTAMP_NTZ) scan column back onto the attribute itself.
  *
  * The regenerated TESTDATA stores `events.ts` as parquet naive µs, which
  * Spark reads as TIMESTAMP_NTZ; the events adapter exposes the engine's
  * contract columns as `ts = cast(ntz as timestamp)` (UTC session zone) and
  * `ts_ns = unix_micros(cast(...)) * 1000`. Both are expressions over the
  * scan attribute, so predicates on them never reach `PushedFilters`.
  * Under a fixed UTC zone the NTZ→instant cast is the identity on the
  * epoch-micros value, so each comparison rewrites exactly onto the NTZ
  * attribute — restoring parquet row-group min/max pruning, which at 100 TB
  * is the difference between scanning the window and scanning everything.
  *
  * Zone safety: the rewrite fires ONLY when the cast's resolved zone is a
  * fixed zero-offset zone (UTC/GMT/Z). Under a DST zone the wall→instant
  * map is non-injective and no literal rewrite is exact, so we leave the
  * plan alone.
  */
object PushNtzTsFilters extends Rule[LogicalPlan] {
  import org.apache.spark.sql.types.TimestampNTZType

  /** True iff the zone id resolves to a FIXED zero-offset zone — any
    * spelling ("UTC", "Etc/GMT", "GMT0", "+00", "Z", …). Fixed-offset rules
    * only: a region zone that merely happens to sit at offset 0 today (e.g.
    * Europe/London in winter) has DST transitions, where the wall→instant
    * map is non-injective and no literal rewrite is exact.
    */
  private def isUtc(tz: Option[String]): Boolean =
    tz.exists { z =>
      try {
        val rules = java.time.ZoneId.of(z, java.time.ZoneId.SHORT_IDS).getRules
        rules.isFixedOffset && rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0
      } catch { case _: java.time.DateTimeException => false }
    }

  /** `cast(ntzAttr as timestamp)` under a zero-offset zone. */
  private object NtzAsTs {
    def unapply(e: Expression): Option[Attribute] = e match {
      case c @ Cast(a: AttributeReference, TimestampType, _, _)
          if a.dataType == TimestampNTZType && isUtc(c.timeZoneId) => Some(a)
      case _ => None
    }
  }

  /** `unix_micros(cast(ntzAttr as timestamp)) * 1000L` (either operand order). */
  private object NtzAsNs {
    def unapply(e: Expression): Option[Attribute] = e match {
      case Multiply(UnixMicros(NtzAsTs(a)), Literal(1000L, LongType), _) => Some(a)
      case Multiply(Literal(1000L, LongType), UnixMicros(NtzAsTs(a)), _) => Some(a)
      case _ => None
    }
  }

  private def ntzLit(micros: Long): Literal = Literal(micros, TimestampNTZType)

  // Bounds for `µ * 1000 CMP L` → `µ CMP' B`, exact for all integers, with
  // overflow guards (None = leave the comparison unrewritten).
  private def ceilDiv(l: Long): Option[Long] =
    if (l > Long.MaxValue - 999L) None else Some(Math.floorDiv(l + 999L, 1000L))
  private def floorDiv(l: Long): Option[Long] = Some(Math.floorDiv(l, 1000L))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // --- ts (instant) form: epoch-micros are identical, swap the literal type.
    case GreaterThanOrEqual(NtzAsTs(a), Literal(u: Long, TimestampType)) =>
      GreaterThanOrEqual(a, ntzLit(u))
    case GreaterThan(NtzAsTs(a), Literal(u: Long, TimestampType)) =>
      GreaterThan(a, ntzLit(u))
    case LessThan(NtzAsTs(a), Literal(u: Long, TimestampType)) =>
      LessThan(a, ntzLit(u))
    case LessThanOrEqual(NtzAsTs(a), Literal(u: Long, TimestampType)) =>
      LessThanOrEqual(a, ntzLit(u))
    case EqualTo(NtzAsTs(a), Literal(u: Long, TimestampType)) =>
      EqualTo(a, ntzLit(u))
    case GreaterThanOrEqual(Literal(u: Long, TimestampType), NtzAsTs(a)) =>
      LessThanOrEqual(a, ntzLit(u))
    case GreaterThan(Literal(u: Long, TimestampType), NtzAsTs(a)) =>
      LessThan(a, ntzLit(u))
    case LessThan(Literal(u: Long, TimestampType), NtzAsTs(a)) =>
      GreaterThan(a, ntzLit(u))
    case LessThanOrEqual(Literal(u: Long, TimestampType), NtzAsTs(a)) =>
      GreaterThanOrEqual(a, ntzLit(u))
    case EqualTo(Literal(u: Long, TimestampType), NtzAsTs(a)) =>
      EqualTo(a, ntzLit(u))

    // --- ts_ns (derived long) form: µ*1000 CMP L ⟺ µ CMP' bound.
    // µ*1000 >= L ⟺ µ >= ceil(L/1000)
    case e @ GreaterThanOrEqual(NtzAsNs(a), Literal(l: Long, LongType)) =>
      ceilDiv(l).map(b => GreaterThanOrEqual(a, ntzLit(b)): Expression).getOrElse(e)
    // µ*1000 > L ⟺ µ > floor(L/1000)
    case e @ GreaterThan(NtzAsNs(a), Literal(l: Long, LongType)) =>
      floorDiv(l).map(b => GreaterThan(a, ntzLit(b)): Expression).getOrElse(e)
    // µ*1000 < L ⟺ µ < ceil(L/1000)
    case e @ LessThan(NtzAsNs(a), Literal(l: Long, LongType)) =>
      ceilDiv(l).map(b => LessThan(a, ntzLit(b)): Expression).getOrElse(e)
    // µ*1000 <= L ⟺ µ <= floor(L/1000)
    case e @ LessThanOrEqual(NtzAsNs(a), Literal(l: Long, LongType)) =>
      floorDiv(l).map(b => LessThanOrEqual(a, ntzLit(b)): Expression).getOrElse(e)
    // literal-on-the-left mirrors
    case e @ GreaterThanOrEqual(Literal(l: Long, LongType), NtzAsNs(a)) =>
      floorDiv(l).map(b => LessThanOrEqual(a, ntzLit(b)): Expression).getOrElse(e)
    case e @ GreaterThan(Literal(l: Long, LongType), NtzAsNs(a)) =>
      ceilDiv(l).map(b => LessThan(a, ntzLit(b)): Expression).getOrElse(e)
    case e @ LessThan(Literal(l: Long, LongType), NtzAsNs(a)) =>
      floorDiv(l).map(b => GreaterThan(a, ntzLit(b)): Expression).getOrElse(e)
    case e @ LessThanOrEqual(Literal(l: Long, LongType), NtzAsNs(a)) =>
      ceilDiv(l).map(b => GreaterThanOrEqual(a, ntzLit(b)): Expression).getOrElse(e)
  }
}

/** Engine extensions entry point: `SparkSession.builder.withExtensions
  * (GraftExtensions.inject)` or spark.sql.extensions=graft.plans.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftExtensions.inject(ext)
}

object GraftExtensions {
  import graft.functions.{HashExpressions => H, VectorExpressions => V}
  import org.apache.spark.sql.catalyst.FunctionIdentifier

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** The engine's native kernels as SQL-callable functions, so every operator
    * is reachable from `spark.sql(...)` as well as the Column API.
    */
  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine", (c: Seq[Expression]) => V.CosineSimilarity(c(0), c(1))),
    ("graft_dot", (c: Seq[Expression]) => V.DotProduct(c(0), c(1))),
    ("graft_l2norm", (c: Seq[Expression]) => V.L2Norm(c(0))),
    ("graft_simhash64", (c: Seq[Expression]) => V.SimHash64(c(0))),
    ("graft_rolling_hash", (c: Seq[Expression]) => H.RollingHash(c(0))),
    ("graft_ngram_hashes", (c: Seq[Expression]) => H.NGramHashes(c(0), intArg(c(1), "n"))),
    ("graft_ngrams", (c: Seq[Expression]) => H.NGramStrings(c(0), intArg(c(1), "n"))),
    ("graft_band_keys", (c: Seq[Expression]) => H.BandKeys(c(0), intArg(c(1), "bands"))),
    ("graft_quantize", (c: Seq[Expression]) => V.QuantizeVec(c(0))),
    ("graft_quant_scale", (c: Seq[Expression]) => V.QuantScale(c(0))),
    ("graft_quantized_dot", (c: Seq[Expression]) => V.QuantizedDot(c(0), c(1))),
    ("graft_zorder", (c: Seq[Expression]) => H.ZOrderKey(c(0), c(1), intArg(c(2), "bits"))),
    ("graft_jl_project", (c: Seq[Expression]) => V.JlProject(c(0), intArg(c(1), "k"))),
    ("graft_l2distsq", (c: Seq[Expression]) => V.L2DistSq(c(0), c(1))),
    ("graft_unicode_fold", (c: Seq[Expression]) => graft.functions.StringNormalize.UnicodeFold(c(0)))
  ).map { case (name, builder) =>
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name),
      builder)
  }

  def inject(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => PushTsRangeToNanos)
    ext.injectOptimizerRule(_ => PushNtzTsFilters)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    functions.foreach(ext.injectFunction)
  }

  /** Register the same functions into an ALREADY-RUNNING session (extensions
    * only apply at session construction; tests and notebooks attach late).
    */
  def registerInto(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
