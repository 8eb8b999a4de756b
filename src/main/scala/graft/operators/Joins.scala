package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins, composed from existing
  * ops so Catalyst keeps full visibility (SURVEY.md §2.3; preference order
  * (a) of the custom-operator ladder).
  *
  * Both are shaped for 100 TB:
  *  - as-of join: ONE hash shuffle on the key + an in-partition sort — the
  *    union-and-forward-fill formulation; never an inequality (nested-loop)
  *    join.
  *  - range join: time-bucketing turns the interval predicate into an
  *    equi-join on (key, bucket) with a residual filter — the classic
  *    banding trick; shuffle volume grows with matches, not with the cross
  *    product.
  */
object Joins {

  /** The bucketed temporal joins stage work in temp columns; an input that
    * already carries one of those names would be silently overwritten by
    * `withColumn` and join on garbage. Fail at plan-build time instead.
    */
  private def reserveBucketCols(
      left: DataFrame, right: DataFrame, op: String, reserved: Seq[String]): Unit =
    Seq("left" -> left, "right" -> right).foreach { case (side, df) =>
      val clash = reserved.filter(df.columns.contains)
      require(clash.isEmpty,
        s"$op reserves column name(s) ${clash.mkString(", ")} for internal " +
          s"bucketing; rename them on the $side input")
    }

  /** For every left row, attach the payload of the most recent right row with
    * the same key and `rightTs <= leftTs` (ASOF >= semantics; a same-instant
    * right row matches). Left rows with no prior right row are dropped
    * (inner as-of).
    *
    * `rightPayload` columns must not collide with left columns. Ties on
    * (key, rightTs) resolve to the first right row by `rightTieBreak` —
    * deterministic for any input.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightTieBreak: String): DataFrame = {
    // one row per (key, ts) on the right: keep-first by the tiebreak so the
    // forward-fill below is deterministic
    val rightDedup = Ops.dedupKeepFirst(
      graft.types.DedupSpec(keys :+ rightTs, Seq(rightTieBreak)))(right)

    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightDedup.select(rightPayload.map(col): _*).schema.fields)))
    val r = rightDedup.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        struct(rightPayload.map(col): _*).as("__payload")): _*)
    // align schemas: right side carries nulls for non-key left columns
    val rAligned = leftCols.foldLeft(r) { (d, c) =>
      if (keys.contains(c)) d else d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rAligned)
      .withColumn("__filled", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__filled").isNotNull)
      .select(leftCols.map(col) ++ rightPayload.map(p => col(s"__filled.$p")): _*)
  }

  /** Forward as-of: for every left row, the EARLIEST right row with the same
    * key and `rightTs >= leftTs` (the "next event" lookup — e.g. first
    * purchase after a click). Same single-shuffle union-and-fill shape as
    * [[asOfJoin]], scanning time DESCENDING so the running `last` carries
    * the nearest FUTURE payload backward.
    */
  def asOfJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightTieBreak: String): DataFrame = {
    val rightDedup = Ops.dedupKeepFirst(
      graft.types.DedupSpec(keys :+ rightTs, Seq(rightTieBreak)))(right)

    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightDedup.select(rightPayload.map(col): _*).schema.fields)))
    val r = rightDedup.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        struct(rightPayload.map(col): _*).as("__payload")): _*)
    val rAligned = leftCols.foldLeft(r) { (d, c) =>
      if (keys.contains(c)) d else d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)

    // DESC time scan; at equal ts the right row (side 0) still precedes the
    // left row, so a same-instant right row matches (>= semantics)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rAligned)
      .withColumn("__filled", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__filled").isNotNull)
      .select(leftCols.map(col) ++ rightPayload.map(p => col(s"__filled.$p")): _*)
  }

  /** [[asOfJoin]] through the NATIVE whole-operator path
    * ([[graft.plans.AsOfJoinPlan]] → [[graft.plans.AsOfJoinExec]], the
    * custom-operator ladder's tier (c)): same semantics and the same
    * deterministic tiebreak pre-dedup, but planned as a co-partitioned
    * streaming merge — two key exchanges (elidable when the inputs are
    * bucketed), in-partition sorts, O(1) merge state — instead of the
    * union-and-forward-fill window. AsOfNativeSpec pins result equality
    * against [[asOfJoin]] across partitionings.
    *
    * Requires the session to carry [[graft.plans.GraftExtensions]] (the
    * strategy is planner-injected; [[graft.GraftSession]] sessions do).
    */
  def asOfJoinNative(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightTieBreak: String): DataFrame =
    asOfNativeImpl(left, right, keys, leftTs, rightTs, rightPayload,
      rightTieBreak, forward = false)

  /** [[asOfJoinForward]] through the native path — the same mirrored merge
    * ([[graft.plans.AsOfJoinExec]] with ts sorted descending), pinned
    * row-identical to the composed form by AsOfNativeSpec.
    */
  def asOfJoinForwardNative(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightTieBreak: String): DataFrame =
    asOfNativeImpl(left, right, keys, leftTs, rightTs, rightPayload,
      rightTieBreak, forward = true)

  private def asOfNativeImpl(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightTieBreak: String,
      forward: Boolean): DataFrame = {
    require(rightPayload.nonEmpty, "asOfJoinNative needs at least one payload column")
    val clash = rightPayload.filter(left.columns.contains)
    require(clash.isEmpty,
      s"payload column(s) ${clash.mkString(", ")} collide with left columns")
    // (key, ts)-unique right side: the merge's "last consumed right row"
    // rule is only deterministic when same-instant rows are pre-collapsed
    val rightDedup = Ops.dedupKeepFirst(
      graft.types.DedupSpec(keys :+ rightTs, Seq(rightTieBreak)))(right)
    // fresh exprIds on the right via aliases, so a self-as-of (left and
    // right scanning the same source) cannot produce ambiguous attributes
    val rCols = (keys :+ rightTs) ++ rightPayload
    val rPrepped = rightDedup.select(rCols.distinct.map(c => col(c).as("__r_" + c)): _*)
    val spark = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val lPlan = left.queryExecution.analyzed
    val rPlan = rPrepped.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val node = graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(k => attr(rPlan, "__r_" + k)),
      attr(lPlan, leftTs), attr(rPlan, "__r_" + rightTs),
      rightPayload.map(p => attr(rPlan, "__r_" + p)), forward)
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark, node)
      .select(left.columns.map(col) ++
        rightPayload.map(p => col("__r_" + p).as(p)): _*)
  }

  /** Pairs (left, right) with equal keys and `rightTs` in
    * `[leftTs + lowerMicros, leftTs + upperMicros)`. Bucket width is the
    * interval span, so each left row lands in at most two buckets and every
    * qualifying pair meets in exactly one (key, bucket) cell.
    */
  def timeRangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      lowerMicros: Long,
      upperMicros: Long): DataFrame = {
    require(upperMicros > lowerMicros, "empty interval")
    // Column names outside `keys` must be disjoint between the two sides
    // (same contract as a plain join with a post-filter).
    reserveBucketCols(left, right, "timeRangeJoin", Seq("__lb0", "__bucket"))
    val width = upperMicros - lowerMicros
    val l = left.withColumn("__lb0", expr(s"(unix_micros($leftTs) + $lowerMicros) DIV $width"))
    val lExploded = l.withColumn("__bucket",
      explode(array(col("__lb0"), col("__lb0") + 1)))
    val r = right.withColumn("__bucket", expr(s"unix_micros($rightTs) DIV $width"))
    lExploded.join(r, keys :+ "__bucket")
      .filter(
        unix_micros(col(rightTs)) >= unix_micros(col(leftTs)) + lowerMicros &&
          unix_micros(col(rightTs)) < unix_micros(col(leftTs)) + upperMicros)
      .drop("__lb0", "__bucket")
  }

  /** Interval OVERLAP join: pairs (left, right) with equal `keys` whose
    * half-open validity windows intersect — `[lStart, lEnd) ∩ [rStart,
    * rEnd) ≠ ∅`. Completes the temporal-join family: [[asOfJoin]] picks the
    * latest prior point, [[timeRangeJoin]] matches points into a window
    * around a point, this matches window against window (sessions ×
    * campaigns, outage windows × SLA windows).
    *
    * Scale shape: both sides explode their interval onto `widthMicros`-wide
    * time buckets and meet in an equi-join on (keys, bucket) — never a
    * cross join with an inequality, which is the shape Spark would plan
    * naively and that dies at any real row count. An overlapping pair
    * shares every bucket its intersection covers; instead of a distinct
    * (a second full shuffle), the join keeps a pair only in the bucket
    * containing `max(lStart, rStart)` — the intersection's first instant,
    * which both explode ranges provably cover — so each pair survives
    * exactly once. Pick `widthMicros` near the typical interval span: an
    * interval spanning b buckets costs b exploded rows.
    *
    * The explode is UNBOUNDED in the interval span, so one pathological
    * outlier (a year-long interval at an hour-wide bucket) would silently
    * emit thousands of rows for a single record and skew its (key, bucket)
    * reducers. `maxBucketsPerRow` bounds the per-row cost: any interval
    * spanning more buckets fails the job with a typed data error naming the
    * span — the fix is a wider `widthMicros` (or pre-splitting the outlier),
    * and that decision must be the caller's, not a silent 8000× blowup.
    *
    * Contract: intervals with `end <= start` are empty and match nothing;
    * non-key column names must be disjoint between the sides; `__bucket` is
    * reserved.
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      widthMicros: Long,
      maxBucketsPerRow: Int = 4096): DataFrame = {
    require(widthMicros > 0, "bucket width must be positive")
    require(maxBucketsPerRow > 1, "maxBucketsPerRow must allow the 2-bucket straddle case")
    reserveBucketCols(left, right, "intervalOverlapJoin", Seq("__bucket"))
    def buckets(s: String, e: String) = {
      val lo = expr(s"unix_micros($s) DIV $widthMicros")
      val hi = expr(s"(unix_micros($e) - 1) DIV $widthMicros")
      when(col(e) > col(s),
        when(hi - lo >= maxBucketsPerRow,
          raise_error(concat(
            lit(s"intervalOverlapJoin: interval [$s, $e) spans "),
            (hi - lo + 1).cast("string"),
            lit(s" buckets at widthMicros=$widthMicros, over maxBucketsPerRow=" +
              s"$maxBucketsPerRow — widen widthMicros or pre-split the outlier"))))
          .otherwise(sequence(lo, hi)))
        .otherwise(array())
    }
    val l = left.withColumn("__bucket", explode(buckets(leftStart, leftEnd)))
    val r = right.withColumn("__bucket", explode(buckets(rightStart, rightEnd)))
    l.join(r, keys :+ "__bucket")
      .filter(
        unix_micros(col(leftStart)) < unix_micros(col(rightEnd)) &&
          unix_micros(col(rightStart)) < unix_micros(col(leftEnd)) &&
          col("__bucket") === greatest(
            expr(s"unix_micros($leftStart) DIV $widthMicros"),
            expr(s"unix_micros($rightStart) DIV $widthMicros")))
      .drop("__bucket")
  }

  /** Point-in-time (temporal) lookup against a Type-2 dimension history
    * ([[Scd]]): for each fact row, attach the dimension version whose
    * half-open validity interval `[validFrom, validTo)` contains the fact's
    * timestamp — `validTo IS NULL` meaning "still current". The warehouse
    * companion of [[asOfJoin]]: as-of picks the latest PRIOR observation
    * from a change log; point-in-time picks the version a history table
    * says was TRUE at that instant (facts before the key's first version
    * match nothing, which `how = "left"` surfaces as nulls).
    *
    * Scale shape: an equi-join on the dimension key with the interval
    * predicate evaluated as the join's non-equi condition — each fact meets
    * only its own key's versions (per-key version counts are small by SCD2
    * nature, so the per-key cross-section is bounded), one key-partitioned
    * shuffle, and a history side small enough broadcasts under AQE. No
    * bucketed time-range explode is needed precisely because the key
    * equality already prunes the pair space — [[timeRangeJoin]] exists for
    * the keyless/wide-interval case.
    */
  def pointInTimeJoin(
      facts: DataFrame,
      history: DataFrame,
      keys: Seq[String],
      factTs: String,
      validFrom: String = "valid_from",
      validTo: String = "valid_to",
      how: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "point-in-time lookup needs the dimension key")
    // The history is often DERIVED from the facts table itself (an SCD2
    // change-log rollup of the same source), so `facts(k) === history(k)`
    // would hit Spark's same-lineage attribute ambiguity. Renaming the
    // history keys first makes the join condition unambiguous by name.
    val pref = "__pit_"
    val h = keys.foldLeft(history)((df, k) => df.withColumnRenamed(k, pref + k))
    val cond = keys.map(k => facts(k) === h(pref + k)).reduce(_ && _) &&
      facts(factTs) >= h(validFrom) &&
      (h(validTo).isNull || facts(factTs) < h(validTo))
    keys.foldLeft(facts.join(h, cond, how))((df, k) => df.drop(pref + k))
  }

  /** Manual key-salting for joins whose build side has pathological hot keys
    * beyond what AQE's skew-split handles: the skewed (left) side gets a
    * random salt in [0, factor), the small-but-replicable right side is
    * exploded once per salt value, and the join key becomes (key, salt) — a
    * hot key's rows spread over `factor` reducers. Results are identical to
    * the unsalted join; the salt uses a deterministic per-row hash (not
    * rand()) so retried tasks stay consistent.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      factor: Int,
      joinType: String = "inner"): DataFrame = {
    require(factor > 1, "salting needs factor > 1")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(factor)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    saltedLeft.join(saltedRight, keys :+ "__salt", joinType).drop("__salt")
  }
}
