package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded differential privacy for released aggregates — the third rung of
  * the release ladder after scrubbing (direct identifiers) and
  * k-anonymity/l-diversity ([[Anonymity]], quasi-identifiers): a census
  * whose per-class counts carry calibrated noise, so a single row's
  * presence moves the release by at most one noised count — inference
  * bounded by ε regardless of side knowledge, PROVIDED the released class
  * set is data-independent (pass [[dpCensus]]'s `domain`; see its doc for
  * what the observed-classes-only form still leaks).
  *
  * Mechanism: the geometric mechanism (Ghosh, Roughgarden, Sundararajan,
  * "Universally utility-maximizing privacy mechanisms", STOC'09) — the
  * discrete analogue of Laplace, and the utility-optimal ε-DP mechanism
  * for integer counts. Noise Z is two-sided geometric with
  * α = 2^-j (so ε = j·ln 2 per count; j=1 ≈ 0.693):
  * P(Z = z) = ((1-α)/(1+α))·α^|z|. Counts over DISJOINT classes compose in
  * parallel, so the whole census is ε-DP, not ε·|classes|.
  *
  * SEEDED: the uniform driving each class's noise is
  * [[Sampling.unitHash]](classId, salt) — a keyed deterministic hash — so
  * the release is REPLAYABLE: re-running the census (backfill, audit,
  * cross-engine check) reproduces the identical noisy counts, and the
  * DuckDB oracle replays them bit-for-bit. Privacy holds against readers
  * WITHOUT the salt (the keyed-hash-as-PRF assumption every seeded-noise
  * release makes; hold the salt like a credential — anyone with it can
  * subtract the noise). Noise is a pure function of (classId, salt): it
  * never reads the data, so neighboring datasets differ by exactly the
  * count delta — the sensitivity-1 calibration is what the spec pins.
  *
  * BITWISE cross-engine determinism is why the inverse CDF below avoids
  * transcendentals: α = 2^-j keeps every CDF boundary an IEEE-exact
  * scaling of one correctly-rounded constant (additions, multiplies,
  * divides and comparisons are correctly rounded in BOTH engines by IEEE
  * 754; only log/exp are not), so Spark and any SQL mirror agree on every
  * noise draw exactly — no tolerance, no last-ulp coin flips.
  */
object Privacy {

  /** The seeded per-class uniform in [0, 1): [[Sampling.unitHash]] of the
    * class id under the release's secret salt.
    *
    * @note every RELEASE needs its own salt — two releases sharing
    *       (classId, salt) share their noise draws (e.g. a [[dpCensus]]
    *       and a [[dpSum]] over the same classes), a correlation the
    *       parallel-composition argument does not cover. Declared pipeline
    *       steps reject a shared salt at parse time
    *       ([[graft.pipeline.PipelineConfig]]); direct callers own it.
    */
  def seededUniform(classId: Column, salt: Long): Column =
    Sampling.unitHash(classId, salt)

  /** The classId hardening every release shares, evaluated over the
    * CLASSES-sized frame (one row per released class — never a data pass):
    *
    *   - a NULL id FAILS the job. A NULL quasi value survives the groupBy
    *     as its own class, propagates NULL through any classIdOf
    *     arithmetic, and a NULL uniform would evaluate the inverse-CDF
    *     indicators to their otherwise-branches — magnitude 0, noise 0,
    *     the EXACT count released with no error. Callers with legitimate
    *     NULL quasi values filter or coalesce them explicitly, so the
    *     release's domain is a stated decision rather than an accident;
    *   - a COLLISION fails the job. Two classes sharing an id share a
    *     noise draw, voiding the parallel-composition argument the
    *     whole-release ε claim rests on — and it is easy to get wrong
    *     (length-of-string "discriminators", under-spaced multipliers).
    *     The check is a classes-sized window count per id: > 1 means two
    *     distinct class rows mapped together.
    *
    * Returns the frame with a validated `__cid` LONG column; both raises
    * fire at action time inside the release plan, so no extra pass over
    * the data and no extra action.
    */
  private def withCheckedClassId(classes: DataFrame, classIdOf: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    classes
      .withColumn("__cid", when(classIdOf.cast("long").isNull,
        raise_error(lit("dp release: classId is NULL for some class — a NULL " +
          "quasi value (or NULL-yielding classIdOf) would silently zero the " +
          "noise and release the exact value; filter or coalesce NULL quasi " +
          "values before the release")).cast("long"))
        .otherwise(classIdOf.cast("long")))
      .withColumn("__cid_n", count(lit(1)).over(Window.partitionBy(col("__cid"))))
      .withColumn("__cid", when(col("__cid_n") > 1L,
        raise_error(lit("dp release: classIdOf is not injective — two classes " +
          "share a class id and would share one noise draw, voiding the " +
          "parallel-composition argument; space the ids (e.g. multiply the " +
          "outer key past the inner key's range)")).cast("long"))
        .otherwise(col("__cid")))
      .drop("__cid_n")
  }

  /** CDF boundaries of the noise MAGNITUDE: w >= boundary(m) adds 1 to
    * |Z|. boundary(m) = 1 - (2α/(1+α))·α^m with α = 2^-j — one
    * correctly-rounded base constant scaled by exact powers of two.
    * Exposed so the SQL oracle can restate the identical doubles.
    */
  def magnitudeBoundaries(j: Int, maxMagnitude: Int): Seq[Double] = {
    require(j >= 1, s"j must be >= 1 (epsilon = j*ln2), got $j")
    require(maxMagnitude >= 1, s"maxMagnitude must be >= 1, got $maxMagnitude")
    val alpha = math.pow(0.5, j) // exact
    val base = 2.0 * alpha / (1.0 + alpha) // one correctly-rounded divide
    (0 until maxMagnitude).map(m => 1.0 - base * math.pow(0.5, (j.toLong * m).toDouble))
  }

  /** Two-sided geometric noise from a uniform: sign from the top bit,
    * magnitude from the indicator-sum inverse CDF over
    * [[magnitudeBoundaries]]. `maxMagnitude` truncates the tail — at the
    * default 48 the excess mass is below the 2^-31 resolution of the
    * seeded uniform itself, i.e. unreachable (the uniform carries 31
    * random bits, so boundaries within 2^-31 of 1.0 never fire).
    */
  def geometricNoise(u: Column, j: Int = 1, maxMagnitude: Int = 48): Column = {
    val s = when(u >= lit(0.5), lit(1L)).otherwise(lit(-1L))
    val w = abs(u * lit(2.0) - lit(1.0))
    val m = magnitudeBoundaries(j, maxMagnitude)
      .map(c => when(w >= lit(c), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    s * m
  }

  /** The ε-DP census release: one row per quasi-identifier class with its
    * NOISY count (never the true one) — the class-size report
    * [[Anonymity.census]] produces, releasable without k-suppression
    * because the noise, not the class size, carries the privacy.
    *
    * `classIdOf` must be a deterministic LONG function of the QI columns
    * alone (it is evaluated on the grouped result) and injective across
    * classes — two classes sharing an id would share a noise draw, a
    * correlation the composition argument does not cover.
    *
    * WHICH classes appear in the release:
    *   - `domain = Some(d)`: exactly d's distinct QI tuples — the sound
    *     shape when the class DOMAIN is public but membership is not.
    *     Classes with no data release a noised ZERO, so a unique
    *     individual's class is present either way and only the ±1 count
    *     delta (noised) distinguishes the neighbors. Classes observed in
    *     the data but absent from d are NOT released.
    *   - `domain = None`: observed classes only. Then the release is ε-DP
    *     for the COUNTS given class presence — the row set itself leaks
    *     that each released class is non-empty, which for a
    *     unique-per-person class discloses presence exactly. Use this
    *     form only when the realized class set is itself public (e.g.
    *     coarse public bands); otherwise pass the domain.
    *
    * Scale shape: one partial-aggregating groupBy (plus, with a domain, a
    * classes-sized left join); the noise is a scan-stage expression over
    * the classes-sized output, so the release costs what the raw census
    * costs.
    */
  def dpCensus(df: DataFrame, quasiCols: Seq[String], classIdOf: Column,
      salt: Long, j: Int = 1, domain: Option[DataFrame] = None): DataFrame = {
    require(quasiCols.nonEmpty, "dpCensus needs at least one quasi-identifier")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__true_count"))
    val based = domain match {
      case None => counts
      case Some(d) =>
        d.select(quasiCols.map(col): _*).distinct()
          .join(counts, quasiCols, "left")
          .na.fill(0L, Seq("__true_count"))
    }
    withCheckedClassId(based, classIdOf).select(quasiCols.map(col) :+
      (col("__true_count") +
        geometricNoise(seededUniform(col("__cid"), salt), j))
        .as("noisy_count"): _*)
  }

  /** The ε-DP SUM release — the other workhorse beside the census. Three
    * steps keep one row's influence at EXACTLY ONE noise step, so ε stays
    * j·ln2 like the census instead of silently scaling with the value
    * range (noise calibrated for sensitivity 1 hides nothing about a
    * sensitivity-600 sum):
    *
    *   1. CLIP each value to [0, clipHi] — without it a single outlier
    *      row determines the sum and no finite noise hides it;
    *   2. quantize per row to `unit`-sized steps (integers the noise
    *      algebra is exact over): q = floor(clip(v)/unit), so one row
    *      moves the class sum by at most M = floor(clipHi/unit);
    *   3. BUCKET the class sum by that same M — floor(Σq / M) moves by
    *      at most 1 when any one row changes — and add the sensitivity-1
    *      geometric noise to the bucketed sum.
    *
    * The released `noisy_sum` is therefore in buckets of M·unit ≈ clipHi
    * value-units (multiply back consumer-side): clipHi-sized granularity
    * is the inherent price of ε = j·ln2 — the same order as Laplace
    * (clipHi/ε) noise at ε ≈ 0.7 — and is RELATIVELY precise exactly when
    * sums aggregate many rows. `unit` only tunes the per-row rounding
    * inside a bucket, never ε. Disjoint classes compose in parallel;
    * `domain` has exactly [[dpCensus]]'s semantics and caveat.
    *
    * Determinism: clip (min/max), the divides and floors are all IEEE
    * correctly-rounded, so any SQL mirror computing the same expressions
    * replays the release bitwise, exactly like the census.
    */
  def dpSum(df: DataFrame, quasiCols: Seq[String], valueCol: String,
      clipHi: Double, classIdOf: Column, salt: Long, j: Int = 1,
      unit: Double = 1.0, domain: Option[DataFrame] = None): DataFrame = {
    require(quasiCols.nonEmpty, "dpSum needs at least one quasi-identifier")
    require(clipHi > 0 && unit > 0 && unit <= clipHi,
      s"need 0 < unit <= clipHi, got unit=$unit clipHi=$clipHi")
    val m = math.floor(clipHi / unit).toLong // per-row max, in units
    val q = floor(least(greatest(col(valueCol), lit(0.0)), lit(clipHi)) / lit(unit))
      .cast("long")
    val sums = df.groupBy(quasiCols.map(col): _*)
      .agg(coalesce(sum(q), lit(0L)).as("__true_sum"))
    val based = domain match {
      case None => sums
      case Some(d) =>
        d.select(quasiCols.map(col): _*).distinct()
          .join(sums, quasiCols, "left")
          .na.fill(0L, Seq("__true_sum"))
    }
    withCheckedClassId(based, classIdOf).select(quasiCols.map(col) :+
      (floor(col("__true_sum") / lit(m)).cast("long") +
        geometricNoise(seededUniform(col("__cid"), salt), j))
        .as("noisy_sum"): _*)
  }

  /** The ε-DP MEDIAN release — the third workhorse, and a different
    * mechanism CLASS: medians have unbounded output-perturbation
    * sensitivity (one row can move a median arbitrarily far), so noise on
    * the value cannot work; the EXPONENTIAL mechanism (McSherry & Talwar,
    * FOCS'07) samples an output with probability exponential in its
    * UTILITY instead. The median is [[dpQuantile]] at q = 1/2 — utility
    * −|2·cntBelow(b) + h_b − n|, sensitivity 1 (the per-row delta is in
    * {−1, 0, +1}: 0 when the added row lands in bin b itself), ε = 2·j·ln2
    * — see [[dpQuantile]] for the mechanism, the bitwise-replay contract
    * and the grid semantics.
    *
    * Output: one row per class with `median_bin` (the sampled grid index)
    * and `dp_median` (the bin's CENTER, lo + (bin + 0.5)·(hi−lo)/bins).
    */
  def dpMedian(df: DataFrame, quasiCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, bins: Int, classIdOf: Column, salt: Long,
      j: Int = 1, domain: Option[DataFrame] = None): DataFrame =
    dpQuantile(df, quasiCols, valueCol, 1, 2, lo, hi, bins, classIdOf, salt,
      j, domain)
      .withColumnsRenamed(Map("quantile_bin" -> "median_bin",
        "dp_quantile" -> "dp_median"))

  /** The ε-DP QUANTILE release at rational q = a/b — [[dpMedian]]'s
    * exponential mechanism generalized to any rank. Candidates are the
    * `bins` INTERVALS of a DATA-INDEPENDENT grid over [lo, hi) (grid
    * choice must not read the data — that is part of the privacy
    * statement); the utility of bin β is the INTEGER rank error scaled by
    * b: −|b·cntBelow(β) + a·h_β − a·n|, which scores 0 when the class's
    * q-quantile rank falls across bin β (a point-mass class scores its own
    * bin −|a·n − a·n| = 0 — the a·h_β straddle term is what keeps point
    * masses from degenerating to a flat utility, exactly as in the
    * median's +h). At a=1, b=2 this is bitwise the median's utility.
    *
    * SENSITIVITY: adding or removing one row landing in bin γ moves
    * b·cntBelow(β) + a·h_β − a·n by b·[γ<β] + a·[γ=β] − a, which is in
    * {−a, 0, b−a} — so the utility's sensitivity is Δ = max(a, b−a) and
    * the exact-power-of-two weights w_β = 2^(−j·m_β) realize the
    * mechanism at ε = 2·Δ·j·ln2 (exp(ε·u/(2Δ)) with ε/(2Δ) = j·ln2).
    * The privacy cost of an extreme quantile is real, not an artifact:
    * p90 (a=9, b=10) costs Δ=9, i.e. ε = 18·j·ln2 — state it, don't hide
    * it (an implementation quantizing q to keep Δ=1 would be answering a
    * different query). Keep a/b in lowest terms: a common factor g
    * multiplies every utility by g, silently scaling ε by g — the
    * constructor rejects non-reduced fractions rather than reducing
    * silently, so the declared (a, b) is always the ε that's paid.
    * Values outside [lo, hi) clamp into the edge bins (part of the
    * released query's definition, like [[dpSum]]'s clip).
    *
    * BITWISE cross-engine replay, like the rest of this module, by
    * arithmetic choice: utilities are exact integers, weights are exact
    * powers of two after subtracting each class's minimum rank error (a
    * per-class constant factor that cannot change the sampled
    * distribution), the cumulative weights accumulate in bin order
    * (sequential left-to-right additions — the same order a SQL mirror's
    * ordered prefix `list_sum` uses), and the pick compares the seeded
    * uniform scaled by the total against those prefixes. One honesty
    * note: weights more than ~1074/j rank-error levels above the
    * per-class best underflow to exact zero in double precision —
    * formally an (ε, δ) relaxation with δ below 2^−1000, stated here so
    * the claim is exact rather than approximately exact.
    *
    * Output: one row per class with `quantile_bin` (the sampled grid
    * index) and `dp_quantile` (the bin's CENTER). `domain` has
    * [[dpCensus]]'s semantics and caveat; an empty class's utilities are
    * all 0, so it releases a uniform draw over the grid — pure noise, as
    * it must. Scale shape: one histogram groupBy, then every window is
    * over the classes×bins grid — release-sized, never data-sized.
    */
  def dpQuantile(df: DataFrame, quasiCols: Seq[String], valueCol: String,
      a: Int, b: Int, lo: Double, hi: Double, bins: Int, classIdOf: Column,
      salt: Long, j: Int = 1, domain: Option[DataFrame] = None): DataFrame = {
    require(quasiCols.nonEmpty, "dpQuantile needs at least one quasi-identifier")
    require(a >= 1 && b >= 2 && a < b, s"need 1 <= a < b (q = a/b in (0,1)), got $a/$b")
    require(BigInt(a).gcd(BigInt(b)) == 1,
      s"q must be in lowest terms (a common factor scales epsilon silently), got $a/$b")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    require(bins >= 2 && bins <= 4096, s"bins must be in [2, 4096], got $bins")
    require(j >= 1, s"j must be >= 1 (epsilon = 2*max(a,b-a)*j*ln2), got $j")
    val width = (hi - lo) / bins
    val binOf = least(greatest(
      floor((col(valueCol) - lit(lo)) / lit(width)), lit(0.0)), lit((bins - 1).toDouble))
      .cast("long")
    val hist = df.groupBy(quasiCols.map(col) :+ binOf.as("__bin"): _*)
      .agg(count(lit(1)).as("__h"))
    val classes = withCheckedClassId(
      domain.fold(hist.select(quasiCols.map(col): _*).distinct())(
        _.select(quasiCols.map(col): _*).distinct()),
      classIdOf)
    // the candidate grid per class via a generator, not a cross join: a
    // classes-sized frame fans out to classes x bins in the scan stage,
    // with no cartesian plan node for a planner (or PlanGuard) to flag
    val grid = classes.withColumn("__bin",
      explode(sequence(lit(0L), lit((bins - 1).toLong))))
    val cls = quasiCols.map(col)
    import org.apache.spark.sql.expressions.Window
    val byBin = Window.partitionBy(cls: _*).orderBy(col("__bin"))
    val full = grid.join(hist, quasiCols :+ "__bin", "left")
      .na.fill(0L, Seq("__h"))
      .withColumn("__below",
        coalesce(sum(col("__h")).over(byBin.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("__n", sum(col("__h")).over(Window.partitionBy(cls: _*)))
      .withColumn("__m",
        abs(lit(b.toLong) * col("__below") + lit(a.toLong) * col("__h") -
          lit(a.toLong) * col("__n")))
    val weighted = full
      .withColumn("__mmin", min(col("__m")).over(Window.partitionBy(cls: _*)))
      // exact powers of two: the per-class constant alpha^-mmin scaling
      // cannot change the sampled distribution
      .withColumn("__w", pow(lit(2.0), (lit(-j.toLong) * (col("__m") - col("__mmin")))
        .cast("double")))
      // sequential in-order prefix sums — the accumulation order a SQL
      // mirror's ordered list_sum reproduces bitwise
      .withColumn("__cum",
        sum(col("__w")).over(byBin.rowsBetween(Window.unboundedPreceding, 0)))
      // order-free total: cum is nondecreasing (weights >= 0), so the
      // class total is max(cum) == the last prefix — never an unordered
      // double sum whose accumulation order a shuffle could vary
      .withColumn("__tot", max(col("__cum")).over(Window.partitionBy(cls: _*)))
    val u = seededUniform(col("__cid"), salt)
    weighted
      .filter(col("__cum") > u * col("__tot"))
      .withColumn("__r", row_number().over(byBin))
      .filter(col("__r") === 1)
      .select(quasiCols.map(col) :+
        col("__bin").as("quantile_bin") :+
        (lit(lo) + (col("__bin").cast("double") + lit(0.5)) * lit(width))
          .as("dp_quantile"): _*)
  }
}
