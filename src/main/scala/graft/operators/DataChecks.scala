package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the engine's analog of the reference's
  * data warnings (`app/warnings/data_warnings.py`), re-aimed at what a
  * declarative engine can prove in ONE pass: expectation predicates counted
  * over the whole frame, and robust (median/MAD) outlier profiles per
  * group. Both are pure Column algebra: the expectation report is a single
  * aggregation (every check rides the same scan), the outlier profile is
  * group-keyed windows + aggregations — nothing global, nothing collected.
  */
object DataChecks {

  /** One expectation: rows where `holds` is FALSE (or NULL — an unknown is
    * a violation, not a pass) count as violations.
    */
  final case class Expectation(name: String, holds: Column)

  /** The shared violation counters — one conditional sum per check plus the
    * row total, index-aliased (`__v_i`, `__total`). BOTH scan modes build
    * their aggregates here, so the "pre" and "fused" gates can never
    * diverge on what counts as a violation.
    */
  private def violationAggs(checks: Seq[Expectation]): Seq[Column] =
    checks.zipWithIndex.map { case (c, i) =>
      sum(when(coalesce(c.holds, lit(false)), lit(0L)).otherwise(lit(1L)))
        .as(s"__v_$i")
    } :+ count(lit(1)).as("__total")

  /** Evaluate every expectation in ONE aggregation over one scan — adding a
    * check never adds a pass. Returns one row per expectation:
    * (check, violations, total, passed) with `passed` = no violations.
    *
    * Scale shape: a single partial+final aggregate (each check is a
    * conditional-sum expression in the same agg), then a LITERAL-sized
    * unpivot of the one wide row to long form — the result frame is
    * |checks| rows however large the input.
    */
  def expectationReport(df: DataFrame, checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "at least one expectation")
    // violation columns alias by INDEX, never by the user-supplied name: a
    // name containing a dot/backtick would break col() resolution at run
    // time, and duplicate names would be ambiguous. The name travels only
    // inside the output literal, where any string is safe.
    val aggs = violationAggs(checks)
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // reshape the ONE aggregated row to long form by exploding a
    // literal-width struct array — NOT a per-check union of selects, which
    // would duplicate the aggregation subtree (and the scan) once per check
    val pairs = array(checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check"),
        coalesce(col(s"__v_$i"), lit(0L)).as("violations"))
    }: _*)
    wide
      .select(explode(pairs).as("__p"), col("__total").as("total"))
      .select(
        col("__p.check").as("check"),
        col("__p.violations").as("violations"),
        col("total"),
        when(col("__p.violations") === 0L, lit(1L)).otherwise(lit(0L)).as("passed"))
  }

  /** Fused-scan form of [[expectationReport]]: attaches the SAME violation
    * counters to the plan as `Dataset.observe` metrics, which Spark
    * collects as accumulators DURING whatever action executes the returned
    * frame (the pipeline's sink) — zero extra passes over the data, where
    * the eager report is its own full aggregation job. Returns the
    * instrumented frame plus a results thunk that blocks until the action
    * completes and yields (name, violations, total) per check.
    *
    * The 100 TB trade vs the eager gate: the verdict arrives AFTER the
    * sink's action, so by the time a violation throws, the sink has
    * already written — pair the fused gate with a staged or versioned
    * sink when bad data must never be VISIBLE. The checkpoint stays
    * verdict-gated either way (the caller checks before advancing it).
    */
  def observedExpectations(df: DataFrame, checks: Seq[Expectation])
      : (DataFrame, () => Seq[(String, Long, Long)]) = {
    require(checks.nonEmpty, "at least one expectation")
    val obs = org.apache.spark.sql.Observation("graft_expectations")
    val aggs = violationAggs(checks)
    val results = () => {
      val row = obs.get // blocks until the first action on the frame finishes
      def asLong(v: Any): Long = v match {
        case l: Long => l
        case _ => 0L // sum over zero rows observes as null
      }
      val total = asLong(row("__total"))
      checks.zipWithIndex.map { case (c, i) => (c.name, asLong(row(s"__v_$i")), total) }
    }
    (df.observe(obs, aggs.head, aggs.tail: _*), results)
  }

  /** Exact per-group median without a sketch: rank the group, keep the one
    * or two middle rows, average them. Mirrorable to the last bit (a
    * two-element average is one IEEE add + one divide in any engine),
    * unlike interpolated approximate quantiles whose formulas differ across
    * engines. One partitioned window + one tiny aggregation per call.
    */
  private def groupMedian(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    df.select(col(groupCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      // middle positions: floor((cnt+1)/2) and floor((cnt+2)/2) — equal for
      // odd counts, adjacent for even. floor() matters: Spark's `/` on
      // longs is DOUBLE division, and a bare (cnt+1)/2 = 2.5 would match
      // no rank, silently collapsing even groups to a single middle row
      .filter(col("__rn") === floor((col("__cnt") + 1) / 2) ||
        col("__rn") === floor((col("__cnt") + 2) / 2))
      .groupBy(col(groupCol))
      .agg(avg(col(valueCol)).as("__med"))
  }

  /** Robust per-group outlier profile: median + MAD (median absolute
    * deviation) per group, and the count of rows deviating more than
    * `k × MAD` from the group median. The robust form survives exactly the
    * data that breaks mean/stddev profiling — a heavy-tailed value column's
    * outliers inflate the stddev until nothing is an outlier; the median
    * and MAD barely move.
    *
    * Scale shape: two groupMedian passes (value, then deviation) — each ONE
    * group-partitioned window plus a group-keyed aggregation — and
    * group-keyed equi-joins to attach the medians back. No global windows,
    * no driver data; group cardinality bounds every intermediate.
    *
    * Returns (group, n, med, mad, n_outliers). Raw k×MAD gate — callers
    * wanting the normal-consistent convention multiply k by 1.4826
    * themselves; an exact engine mirror beats a baked-in constant.
    */
  /** Fixed-point scale for the drift distance accumulation: 2^30. Power-of-
    * two multiply + floor are IEEE-exact, long sums are order-free — the
    * same construction as the k-means codebooks, so the summary distance is
    * bitwise deterministic at any parallelism and an oracle replays it.
    */
  private val DriftFp = 1073741824.0

  /** Distribution drift between two snapshots of one relation — the gate a
    * continuously-ingested training corpus needs before a new crawl slice
    * joins the mix (lang mix shifted? value histogram moved?). `bucketExpr`
    * is any bucketing expression (a categorical column, a histogram bin
    * floor, a quality-score band).
    *
    * Returns one row per observed bucket:
    * (bucket, count_a, count_b, share_a, share_b, tvd) — counts exact,
    * shares single divides, and `tvd` (constant across rows) the
    * total-variation distance 0.5·Σ|share_a−share_b|, accumulated in
    * fixed point so it is order-free. TVD is THE drift number to gate on:
    * rational, bounded [0,1], and exactly the fraction of the corpus whose
    * bucket assignment changed.
    *
    * Scale shape: one tagged union scan + ONE bucket-keyed aggregation;
    * the totals and the distance aggregate the |buckets|-sized result, not
    * the data, and re-attach through single-row broadcast equi-joins (a
    * literal key, so no nested-loop shape anywhere).
    */
  def distributionDrift(a: DataFrame, b: DataFrame, bucketExpr: Column): DataFrame = {
    val tagged = a.select(bucketExpr.as("bucket"), lit(0).as("__side"))
      .unionByName(b.select(bucketExpr.as("bucket"), lit(1).as("__side")))
    val counts = tagged.groupBy(col("bucket"))
      .agg(
        sum(when(col("__side") === 0, 1L).otherwise(0L)).as("count_a"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("count_b"))
    val tot = counts.agg(
      sum(col("count_a")).as("__ta"), sum(col("count_b")).as("__tb"))
    // an empty side means "no snapshot": its shares are 0, not NaN — the
    // drift against nothing is then exactly 0.5·Σ share_other = 0.5 (or 0
    // when both are empty), never a NaN that poisons the fold
    def share(cnt: Column, totCol: Column): Column =
      when(totCol > 0, cnt.cast("double") / totCol).otherwise(lit(0.0))
    val shares = counts
      .withColumn("__k", lit(1))
      .join(broadcast(tot.withColumn("__k", lit(1))), Seq("__k"))
      .select(col("bucket"), col("count_a"), col("count_b"),
        share(col("count_a"), col("__ta")).as("share_a"),
        share(col("count_b"), col("__tb")).as("share_b"))
    val dist = shares
      .agg(sum(floor(abs(col("share_a") - col("share_b")) * lit(DriftFp))
        .cast("long")).as("__q"))
      .select((lit(0.5) * (col("__q").cast("double") / lit(DriftFp))).as("tvd"))
    shares
      .withColumn("__k", lit(1))
      .join(broadcast(dist.withColumn("__k", lit(1))), Seq("__k"))
      .drop("__k")
  }

  /** Fused-scan form of the drift gate: the REFERENCE snapshot's bucket
    * census is collected up front (|buckets| rows — the categorical regime
    * the gate targets), then one observe counter per reference bucket plus
    * the row total ride the sink's own action; unseen input buckets are
    * the remainder (total − Σ counters). Returns the instrumented frame
    * and a thunk yielding the TVD (None = empty input, which skips the
    * check like the eager gate).
    *
    * The TVD replays [[distributionDrift]]'s fixed-point fold on the
    * driver — same shares, same per-bucket floor at 2^30 — with ONE
    * deviation: the eager pass floors each unseen input bucket's share
    * separately while the fused pass floors their lumped sum, so fused
    * TVD ≥ eager TVD by less than #unseen-buckets/2^31 — the fused gate
    * can only be (negligibly) more conservative. Refuses (typed) past
    * `maxBuckets` reference buckets: observe metrics are per-task
    * accumulators, so a high-cardinality bucket expression belongs on the
    * eager scan.
    */
  def observedDrift(df: DataFrame, reference: DataFrame, bucketExpr: Column,
      maxBuckets: Int = 512): (DataFrame, () => Option[Double]) = {
    // the cardinality guard must fire BEFORE the census lands on the
    // driver — limit to one past the bound, so a runaway bucketExpr is
    // refused from maxBuckets+1 collected rows, never millions
    val refCensus = reference.groupBy(bucketExpr.as("bucket")).count()
      .limit(maxBuckets + 1).collect()
    if (refCensus.length > maxBuckets)
      throw new graft.GraftDataError(
        s"drift scan 'fused' observed over $maxBuckets reference buckets — " +
          "use scan 'pre' for high-cardinality bucket expressions")
    val refTotal = refCensus.map(_.getLong(1)).sum
    val obs = org.apache.spark.sql.Observation("graft_drift")
    val counters = refCensus.zipWithIndex.map { case (r, i) =>
      val hit = r.get(0) match {
        case null => bucketExpr.isNull
        case v =>
          // lit() covers the categorical regime (strings, numbers, dates);
          // a struct/map-valued bucketExpr has no literal form — refuse
          // typed, pointing at the scan that handles it
          try bucketExpr <=> lit(v)
          catch {
            case e: Exception => throw new graft.GraftDataError(
              s"drift scan 'fused' cannot express a reference bucket of " +
                s"type ${v.getClass.getSimpleName} as a literal — use " +
                "scan 'pre' for structured bucket expressions", e)
          }
      }
      count(when(hit, 1)).as(s"__b_$i")
    } :+ count(lit(1)).as("__total")
    val results = () => {
      val row = obs.get
      def asLong(x: Any): Long = x match { case l: Long => l; case _ => 0L }
      val total = asLong(row("__total"))
      if (total == 0L) None
      else {
        var q = 0L
        var seen = 0L
        refCensus.zipWithIndex.foreach { case (r, i) =>
          val cb = asLong(row(s"__b_$i")); seen += cb
          val sa = if (refTotal > 0) r.getLong(1).toDouble / refTotal else 0.0
          val sb = cb.toDouble / total
          q += math.floor(math.abs(sa - sb) * DriftFp).toLong
        }
        val other = total - seen
        if (other > 0) q += math.floor((other.toDouble / total) * DriftFp).toLong
        Some(0.5 * (q / DriftFp))
      }
    }
    (df.observe(obs, counters.head, counters.tail: _*), results)
  }

  def robustOutliers(
      df: DataFrame, groupCol: String, valueCol: String, k: Double = 3.0): DataFrame = {
    val vals = df.select(col(groupCol), col(valueCol)).filter(col(valueCol).isNotNull)
    val med = groupMedian(vals, groupCol, valueCol)
    val withDev = vals.join(med, Seq(groupCol))
      .withColumn("__dev", abs(col(valueCol) - col("__med")))
    val mad = groupMedian(withDev.select(col(groupCol), col("__dev")), groupCol, "__dev")
      .withColumnRenamed("__med", "__mad")
    withDev.join(mad, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        min(col("__med")).as("med"),
        min(col("__mad")).as("mad"),
        sum(when(col("__dev") > lit(k) * col("__mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }
}
