package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Local test rig is `local[N]` (one JVM), but every knob here is chosen to
  * also be the right default on a multi-executor cluster: AQE on (runtime
  * re-planning, skew-join splitting, partition coalescing), shuffle
  * partitions sized to the rig (driver passes SPARK_GRAFT_CPUS; a real
  * cluster would set this to 2-3x total cores or rely on AQE coalescing),
  * UTC session time zone for deterministic timestamp semantics.
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      // engine Catalyst extensions (e.g. nanos range pushdown); applied when
      // this builder CREATES the session (a reused session keeps its own)
      .withExtensions(graft.plans.GraftExtensions.inject)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      // TESTDATA events.ts is parquet TIMESTAMP(NANOS) — Spark's µs
      // TimestampType can't hold it; read as epoch-nanos long and let the
      // events source adapter truncate to µs (matching DuckDB's reader).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
