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
    checkpoint: Option[() => Unit] = None) {

  /** Build the logical plan without running it. None = source missing + skip. */
  def plan(spark: SparkSession): Option[DataFrame] =
    Sources.open(spark, source, failOnMissing).map { df =>
      transforms.foldLeft(df)((d, t) => t(d))
    }

  /** Run end-to-end: action the sink, then (and only then) the checkpoint.
    * Returns the planned DataFrame when the source existed.
    *
    * A checkpoint may only advance past data that was actually PROCESSED:
    * with no sink configured, the plan is still executed (count) before the
    * checkpoint fires, so a failure anywhere in the transforms keeps the
    * watermark where it was — never "checkpoint written, nothing ran".
    */
  def run(spark: SparkSession): Option[DataFrame] =
    plan(spark).map { df =>
      sink match {
        case Some(s) => s(df)
        case None => if (checkpoint.isDefined) df.count()
      }
      checkpoint.foreach(_())
      df
    }
}
