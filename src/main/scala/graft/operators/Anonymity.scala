package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Release-side anonymity checks for structured data — the complement of
  * the content-side PII operators ([[TextAnalysis.piiScrub]] /
  * [[TextAnalysis.pseudonymize]]): scrubbing removes direct identifiers,
  * but a released table re-identifies through its QUASI-identifiers (the
  * classic linkage attack joins zip/age/sex-like columns against a public
  * register), which is what k-anonymity (Sweeney 2002) bounds — every row
  * must be indistinguishable from at least k-1 others on the QI set — and
  * what l-diversity extends (a k-anonymous class whose SENSITIVE value is
  * constant still discloses it; the class must carry >= l distinct ones).
  *
  * Scale shape: [[withClassSize]] is ONE hash-partitioned window count on
  * the QI key — no census join, no driver state; [[census]] is one
  * groupBy whose output is classes-sized (the QI cardinality, not the
  * data); [[suppressBelowK]] composes the window with a filter, so the
  * whole suppression is one shuffle end to end. Skewed QI classes are
  * exactly the ones k-anonymity KEEPS (big class = safe class), so the
  * skew a celebrity key would inflict on a join here lands on a
  * partial-aggregating count instead.
  */
object Anonymity {

  /** Numeric generalization: `x -> floor(x / width) * width`, the banding
    * step that turns a near-unique numeric column into a usable QI or a
    * bounded-cardinality sensitive attribute. Floor-based, so negative
    * values band consistently (-1 lands in [-width, 0), not [0, width)).
    */
  def band(c: Column, width: Double): Column =
    floor(c / lit(width)) * lit(width)

  /** Per-row annotation: the size of the row's QI equivalence class, via a
    * window count over the QI key — one shuffle, and the class table never
    * materializes anywhere.
    */
  def withClassSize(df: DataFrame, quasiCols: Seq[String],
      sizeCol: String = "class_size"): DataFrame = {
    require(quasiCols.nonEmpty, "k-anonymity needs at least one quasi-identifier")
    // case-insensitive: withColumn resolves names case-insensitively under
    // the default spark.sql.caseSensitive=false, so "Class_Size" would clobber
    require(!df.columns.exists(_.equalsIgnoreCase(sizeCol)),
      s"withClassSize would clobber the existing column '$sizeCol' — pass a free sizeCol")
    df.withColumn(sizeCol,
      count(lit(1)).over(Window.partitionBy(quasiCols.map(col): _*)))
  }

  /** The suppression step: rows whose QI class holds fewer than k members
    * leave, so the released table is k-anonymous on `quasiCols` BY
    * CONSTRUCTION (the standard release transform when generalization
    * alone cannot reach k).
    */
  def suppressBelowK(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    // collision-free temp name: never clobber (or later drop) caller data
    val sz = Iterator.iterate("__kanon_class_size")(_ + "_")
      .dropWhile(n => df.columns.exists(_.equalsIgnoreCase(n))).next()
    withClassSize(df, quasiCols, sz).filter(col(sz) >= k).drop(sz)
  }

  /** Class census — the report a release review reads: one row per QI
    * class with its size and its sensitive-value diversity. A class below
    * k re-identifies; a class with `l_diversity = 1` discloses its
    * sensitive value even at k (every member shares it).
    */
  def census(df: DataFrame, quasiCols: Seq[String], sensitive: Column): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("l_diversity"))
}
