package graft.pipeline

import graft.operators.Ops
import graft.sinks.Sinks
import graft.sources.Sources
import graft.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON-driven pipeline construction — the engine's analog of the
  * reference's config-driven entrypoint (X4/X5: sectioned kwargs at
  * `internal_raw_to_dwh/standard_pipeline.py:44-57`, JSON CLI dispatch gated
  * by `__all__` at `scripts/runs/internal_raw_to_dwh.py:44-57`). A config
  * document declares source, declarative query, enrichment, dedup, sink and
  * checkpoint; the interpreter assembles ONE lazy [[Pipeline]] plan from it.
  *
  * Sinks resolve by name from [[sinkRegistry]] — the K3 strategy-by-name
  * semantics (`postgresql_service.py:92-115`), including the hard failure on
  * names outside the registry.
  */
object PipelineConfig {

  private implicit val formats: Formats = DefaultFormats

  /** K3 — named sink strategies. `options` carries per-sink settings. The
    * jdbc entries are the cluster deploy's loaders (reference
    * `postgresql_service.py`); the file strategies serve the bench env.
    */
  val sinkRegistry: Map[String, (DataFrame, Map[String, String]) => Unit] = Map(
    "parquet" -> ((df, o) => Sinks.writeParquet(df, o("path"))),
    "tsv" -> ((df, o) => Sinks.writeTsv(df, o("path"))),
    "json" -> ((df, o) => Sinks.writeJson(df, o("path"))),
    "orc" -> ((df, o) => Sinks.writeOrc(df, o("path"))),
    "versioned" -> ((df, o) => { Sinks.writeVersioned(df, o("path"), o("runId")); () }),
    "jdbc" -> ((df, o) => Sinks.jdbcWrite(df, o("url"), o("table"), o - "url" - "table")),
    "jdbc_upsert" -> ((df, o) =>
      Sinks.jdbcUpsert(df, o("url"), o("table"),
        conflictColumns = o("keys").split(",").map(_.trim).toSeq,
        action = o.getOrElse("onConflict", "update") match {
          case "nothing" => ConflictNothing
          case "update" => ConflictUpdate
          case other => throw new graft.GraftConfigError(
            s"Unknown onConflict '$other' (expected update|nothing)")
        },
        options = o - "url" - "table" - "keys" - "onConflict")))

  def sink(name: String): (DataFrame, Map[String, String]) => Unit =
    sinkRegistry.getOrElse(name, throw new graft.GraftConfigError(
      s"Sink '$name' is not in the registry: ${sinkRegistry.keys.mkString(", ")}"))

  private val tsPattern =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** F9 — timestamp-format gate at config-parse time (reference
    * `elasticsearch_to_postgresql.py:72-76`, `appsflyer_to_aws_s3.py:40-43`
    * validate run args BEFORE building the pipeline): a malformed bound is a
    * config error now, not an ANSI cast crash mid-run.
    */
  def validateTimestamp(label: String, value: Option[String]): Unit = value.foreach { s =>
    try java.time.LocalDateTime.parse(s, tsPattern)
    catch {
      case e: java.time.format.DateTimeParseException =>
        throw new graft.GraftConfigError(
          s"Invalid timestamp for '$label': '$s' (expected yyyy-MM-dd HH:mm:ss)", e)
    }
  }

  def fromJson(spark: SparkSession, json: String): Pipeline = {
    val cfg = JsonMethods.parse(json)

    val sourceCfg = cfg \ "source"
    val source: Sources.Source = (sourceCfg \ "type").extract[String] match {
      case "parquet" => Sources.ParquetSource((sourceCfg \ "path").extract[String])
      case "csv" =>
        Sources.CsvSource(
          (sourceCfg \ "path").extract[String],
          renames = (sourceCfg \ "renames").extractOrElse[Map[String, String]](Map.empty),
          types = (sourceCfg \ "types").extractOrElse[Map[String, String]](Map.empty).toSeq
            .map { case (c, t) => TypeSpec(c, t) })
      case "jsonlines" => Sources.JsonLinesSource((sourceCfg \ "path").extract[String])
      case other => throw new graft.GraftConfigError(s"Unknown source type: $other")
    }

    val transforms = Seq.newBuilder[DataFrame => DataFrame]

    (cfg \ "query") match {
      case JNothing => ()
      case q =>
        validateTimestamp("query.start", (q \ "start").extractOpt[String])
        validateTimestamp("query.end", (q \ "end").extractOpt[String])
        transforms += Ops.query(QuerySpec(
          rangeField = (q \ "rangeField").extractOpt[String],
          start = (q \ "start").extractOpt[String],
          end = (q \ "end").extractOpt[String],
          filters = (q \ "filters").extractOrElse[Map[String, String]](Map.empty).toSeq,
          sourceFields = (q \ "sourceFields").extractOpt[Seq[String]],
          sortBy = (q \ "sortBy").extractOrElse[Seq[Seq[String]]](Nil)
            .map(p => (p.head, p.lift(1).forall(_ == "asc")))))
    }

    (cfg \ "constants") match {
      case JNothing => ()
      case c => transforms += Ops.enrichConst(c.extract[Map[String, String]].toSeq)
    }

    (cfg \ "additionalFields") match {
      case JNothing => ()
      case af =>
        af.extract[Seq[JValue]].foreach { f =>
          transforms += Ops.enrichFn(FnField(
            fn = (f \ "fn").extract[String],
            inputMapping = (f \ "inputMapping").extractOrElse[Map[String, String]](Map.empty),
            staticArgs = (f \ "staticArgs").extractOrElse[Map[String, String]](Map.empty),
            outputMapping = (f \ "outputMapping").extract[Map[String, String]]))
        }
    }

    (cfg \ "dedup") match {
      case JNothing => ()
      case d =>
        // strategy-by-name, like the sink registry: the reference's
        // keep-first (W1) plus the engine's large-scale dedup family,
        // selectable from config
        transforms += ((d \ "strategy").extractOrElse[String]("keepFirst") match {
          case "keepFirst" =>
            Ops.dedupKeepFirst(DedupSpec(
              dedupBy = (d \ "by").extract[Seq[String]],
              orderBy = (d \ "orderBy").extractOrElse[Seq[String]](Nil)))
          case "exact" =>
            (df: DataFrame) => graft.operators.Dedup.exact(
              df, (d \ "id").extract[String], (d \ "contentColumns").extract[Seq[String]])
          case "minhash" =>
            (df: DataFrame) => graft.operators.Dedup.minhashLsh(
              df, (d \ "id").extract[String], (d \ "text").extract[String])
          case "simhash" =>
            (df: DataFrame) => graft.operators.Dedup.simhash(
              df, (d \ "id").extract[String], (d \ "text").extract[String])
          case "ngram_jaccard" =>
            (df: DataFrame) => graft.operators.Dedup.ngramJaccard(
              df, (d \ "id").extract[String], (d \ "text").extract[String],
              threshold = (d \ "threshold").extractOrElse[Double](0.8))
          case other => throw new graft.GraftConfigError(
            s"Unknown dedup strategy '$other' (expected keepFirst|exact|minhash|simhash|ngram_jaccard)")
        })
    }

    val sinkFn: Option[DataFrame => Unit] = (cfg \ "sink") match {
      case JNothing => None
      case sc =>
        val name = (sc \ "type").extract[String]
        val opts = (sc \ "options").extractOrElse[Map[String, String]](Map.empty)
        Some(df => sink(name)(df, opts))
    }

    val checkpointFn: Option[() => Unit] = (cfg \ "checkpoint") match {
      case JNothing => None
      case cc =>
        val path = (cc \ "path").extract[String]
        val values = (cc \ "values").extractOrElse[Map[String, String]](Map.empty)
        Some(() => Sinks.writeCheckpoint(spark, path, values))
    }

    Pipeline(
      source = source,
      transforms = transforms.result(),
      failOnMissing = (cfg \ "failOnMissing").extractOrElse[Boolean](true),
      sink = sinkFn,
      checkpoint = checkpointFn)
  }
}
