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
    *       parallel-composition argument does not cover.
    */
  def seededUniform(classId: Column, salt: Long): Column =
    Sampling.unitHash(classId, salt)

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
    based.select(quasiCols.map(col) :+
      (col("__true_count") +
        geometricNoise(seededUniform(classIdOf.cast("long"), salt), j))
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
    based.select(quasiCols.map(col) :+
      (floor(col("__true_sum") / lit(m)).cast("long") +
        geometricNoise(seededUniform(classIdOf.cast("long"), salt), j))
        .as("noisy_sum"): _*)
  }

  /** The ε-DP MEDIAN release — the third workhorse, and a different
    * mechanism CLASS: medians have unbounded output-perturbation
    * sensitivity (one row can move a median arbitrarily far), so noise on
    * the value cannot work; the EXPONENTIAL mechanism (McSherry & Talwar,
    * FOCS'07) samples an output with probability exponential in its
    * UTILITY instead. Candidates are the `bins` INTERVALS of a
    * DATA-INDEPENDENT grid over [lo, hi) (grid choice must not read the
    * data — that is part of the privacy statement); the utility of bin b
    * is −|2·cntBelow(b) + h_b − n|: the doubled rank error of calling
    * bin b the median, with the bin's own h_b values straddling it (a
    * class concentrated in one bin scores that bin 0, where a pure
    * edge-rank utility degenerates to a flat vector). Adding or removing
    * one row landing in bin γ moves 2·cntBelow(b) + h_b − n by
    * 2·[γ<b] + [γ=b] − 1 ∈ {−1, +1} for EVERY b, so the utility has
    * sensitivity 1 and weights w_b = α^|2·cntBelow(b)+h_b−n| with
    * α = 2^−j realize the mechanism at ε = 2·j·ln2 (exp(ε·u/2) with
    * ε/2 = j·ln2). Values outside [lo, hi) clamp into the edge bins
    * (part of the released query's definition, like [[dpSum]]'s clip).
    *
    * BITWISE cross-engine replay, like the rest of this module, by
    * arithmetic choice: weights are exact powers of two after subtracting
    * each class's minimum rank error (a per-class constant factor that
    * cannot change the sampled distribution), the cumulative weights
    * accumulate in bin order (sequential left-to-right additions — the
    * same order a SQL mirror's ordered prefix `list_sum` uses), and the
    * pick compares the seeded uniform scaled by the total against those
    * prefixes. One honesty note: weights more than ~1074/j rank-error
    * levels above the per-class best underflow to exact zero in double
    * precision — formally an (ε, δ) relaxation with δ below 2^−1000,
    * stated here so the claim is exact rather than approximately exact.
    *
    * Output: one row per class with `median_bin` (the sampled grid index)
    * and `dp_median` (the bin's CENTER, lo + (bin + 0.5)·(hi−lo)/bins).
    * `domain` has [[dpCensus]]'s semantics and caveat; an empty class's
    * utilities are all −n = 0, so it releases a uniform draw over the
    * grid — pure noise, as it must.
    */
  def dpMedian(df: DataFrame, quasiCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, bins: Int, classIdOf: Column, salt: Long,
      j: Int = 1, domain: Option[DataFrame] = None): DataFrame = {
    require(quasiCols.nonEmpty, "dpMedian needs at least one quasi-identifier")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    require(bins >= 2 && bins <= 4096, s"bins must be in [2, 4096], got $bins")
    require(j >= 1, s"j must be >= 1 (epsilon = 2*j*ln2), got $j")
    val width = (hi - lo) / bins
    val binOf = least(greatest(
      floor((col(valueCol) - lit(lo)) / lit(width)), lit(0.0)), lit((bins - 1).toDouble))
      .cast("long")
    val hist = df.groupBy(quasiCols.map(col) :+ binOf.as("__bin"): _*)
      .agg(count(lit(1)).as("__h"))
    val classes = domain.fold(hist.select(quasiCols.map(col): _*).distinct())(
      _.select(quasiCols.map(col): _*).distinct())
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
        abs(lit(2L) * col("__below") + col("__h") - col("__n")))
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
    val u = seededUniform(classIdOf.cast("long"), salt)
    weighted
      .filter(col("__cum") > u * col("__tot"))
      .withColumn("__r", row_number().over(byBin))
      .filter(col("__r") === 1)
      .select(quasiCols.map(col) :+
        col("__bin").as("median_bin") :+
        (lit(lo) + (col("__bin").cast("double") + lit(0.5)) * lit(width))
          .as("dp_median"): _*)
  }
}
