package graft

/** Ad-hoc diagnostic main: prints schemas + a few rows of each test table.
  * Used during development to pin down parquet type mapping (e.g. how Spark
  * reads the ns-precision `events.ts` column vs DuckDB's µs truncation).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    ev.printSchema()
    ev.selectExpr("event_id", "cast(ts as string) AS ts_str").show(3, false)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.printSchema()
    spark.stop()
  }
}
